"""Shared Flax building blocks (NHWC, MXU-friendly)."""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv → BatchNorm → optional ReLU.

    Inference (default) uses running statistics — the pipeline runs
    pretrained/imported weights.  Trainers call with ``train=True`` so
    BN normalizes with batch statistics and updates the running ones
    (requires ``mutable=["batch_stats"]`` in ``apply``)."""

    features: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: str = "SAME"
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel, self.kernel) if isinstance(self.kernel, int) \
            else self.kernel
        x = nn.Conv(self.features, k, strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.995, use_scale=False,
                         dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x
