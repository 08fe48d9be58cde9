"""Pallas TPU kernels for the hot ops XLA lowers poorly.

Three histogram-equalization kernels, in lineage order: the direct
256-lane sweep (:mod:`.equalize`), the radix-16 MXU formulation
(:mod:`.equalize_v2`, ~2.3× faster, bit-identical), and the
production kernel (:mod:`.equalize_v3`): radix-16 with in-register
binning, a cumulative-histogram second output, and native-width
planes — the scene detector uses v3; v1/v2 stay as cross-checked
references.
"""
from facerec_tpu.ops.pallas.equalize import equalize_tpu
from facerec_tpu.ops.pallas.equalize_v2 import equalize_tpu_v2
from facerec_tpu.ops.pallas.equalize_v3 import equalize_stats_tpu

__all__ = ["equalize_tpu", "equalize_tpu_v2", "equalize_stats_tpu"]
