"""Pallas TPU kernels for the hot ops XLA lowers poorly.

One production histogram-equalization kernel (:mod:`.equalize`):
radix-16 MXU formulation with in-register binning, a
cumulative-histogram second output, and native-width planes — fused
single-pass for planes that fit VMEM, row-tiled two-pass for any
larger resolution.  The kernel lineage (256-lane sweep → radix-16 →
in-register binning) is documented in docs/DESIGN.md; the bincount
path in ops/scene.py:_equalize_raw is the cross-checked oracle.
"""
from facerec_tpu.ops.pallas.equalize import equalize_stats_tpu, pack_planes

__all__ = ["equalize_stats_tpu", "pack_planes"]
