"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


FRAME_AXIS = "frames"


def frame_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the frame (time) axis — the film is the long
    sequence (SURVEY.md §5.7)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (FRAME_AXIS,))
