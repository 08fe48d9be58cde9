"""Pallas TPU kernels for the hot ops XLA lowers poorly."""
from facerec_tpu.ops.pallas.equalize import equalize_tpu

__all__ = ["equalize_tpu"]
