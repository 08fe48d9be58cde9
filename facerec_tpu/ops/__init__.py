"""Batched device ops — the numerical core of the pipeline.

Everything here is pure JAX on static shapes: traceable under ``jit``,
``vmap`` and ``shard_map``.  Hot ops have Pallas TPU kernels with jnp
fallbacks for CPU tests.
"""
