"""Single-buffer device→host payload packing.

On production hosts a device→host copy costs per-buffer overhead; on
the tunneled bench harness every fetched buffer pays a full RPC round
trip (~0.5 s), so fetching a dozen small arrays per block serializes
into seconds.  Packing the whole per-block payload into ONE uint8
buffer on device (bools widened to bytes, everything else bitcast —
bit-exact) makes the fetch a single transfer; the host slices it back
into the original pytree with numpy views.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_tree(tree) -> jnp.ndarray:
    """Device-side: pytree of arrays → one flat uint8 buffer."""
    leaves = jax.tree.leaves(tree)
    parts = []
    for x in leaves:
        x = jnp.asarray(x)
        if x.dtype == jnp.bool_:
            parts.append(x.astype(jnp.uint8).reshape(-1))
        else:
            parts.append(
                jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1))
    if not parts:
        return jnp.zeros((0,), jnp.uint8)
    return jnp.concatenate(parts)


def tree_spec(tree) -> Tuple[object, List[Tuple[tuple, np.dtype]]]:
    """(treedef, [(shape, dtype)]) — from arrays or ShapeDtypeStructs
    (e.g. a ``jax.eval_shape`` result)."""
    leaves, treedef = jax.tree.flatten(tree)
    return treedef, [(tuple(x.shape), np.dtype(x.dtype)) for x in leaves]


def unpack_tree(buf: np.ndarray, treedef, specs):
    """Host-side inverse of :func:`pack_tree`."""
    out = []
    off = 0
    buf = np.asarray(buf)
    for shape, dtype in specs:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if dtype == np.bool_:
            nb = n
            arr = buf[off:off + nb].astype(bool).reshape(shape)
        else:
            nb = n * dtype.itemsize
            arr = buf[off:off + nb].view(dtype).reshape(shape)
        off += nb
        out.append(arr)
    assert off == buf.size, (off, buf.size)
    return jax.tree.unflatten(treedef, out)
