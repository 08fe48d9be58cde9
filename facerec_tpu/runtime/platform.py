"""JAX platform selection.

The axon TPU plugin self-registers at interpreter start and overrides
``JAX_PLATFORMS``, so a plain env var cannot force CPU execution.
``ensure_platform`` applies ``FACEREC_PLATFORM`` (e.g. ``cpu``) through
jax.config *after* import, which does take effect as long as no backend
has initialized yet.  Called by every stage CLI before first device use.
"""
from __future__ import annotations

import os


def ensure_platform() -> None:
    platform = os.environ.get("FACEREC_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
