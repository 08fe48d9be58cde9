"""JAX platform selection.

The axon TPU plugin self-registers at interpreter start and overrides
``JAX_PLATFORMS``, so a plain env var cannot force CPU execution.
``ensure_platform`` applies ``FACEREC_PLATFORM`` (e.g. ``cpu``) through
jax.config *after* import, which does take effect as long as no backend
has initialized yet.  Called by every stage CLI before first device use.
"""
from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def setup_compilation_cache() -> None:
    """Persist XLA executables across processes (first TPU compiles of
    the full models run minutes; subsequent runs hit the cache)."""
    import jax

    cache_dir = os.environ.get("FACEREC_JAX_CACHE",
                               os.path.join(_REPO_ROOT, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def ensure_platform() -> None:
    platform = os.environ.get("FACEREC_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    setup_compilation_cache()
