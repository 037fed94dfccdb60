"""Scene-graph gather / pool primitives.

Replaces the reference's index_select + ``scatter_add`` message passing
(``graph.py:79-116``) with one-hot matmuls over the *padded* per-image object
and triple axes: with O <= MAX_OBJS (9) and T <= MAX_TRIPLES (16) the one-hot
contraction is a tiny MXU matmul, avoids atomics entirely, and vmaps over the
batch axis.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def triple_gather(obj_vecs: jax.Array, edges: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Gather subject/object vectors for each triple.

    Args:
      obj_vecs: (N, O, D).
      edges: (N, T, 2) int32 local object indices [s, o] per triple
        (reference graph.py:75-80 uses flat global indices).

    Returns:
      (s_vecs, o_vecs): each (N, T, D).
    """
    s_idx = edges[..., 0]
    o_idx = edges[..., 1]
    s_vecs = jnp.take_along_axis(obj_vecs, s_idx[..., None], axis=1)
    o_vecs = jnp.take_along_axis(obj_vecs, o_idx[..., None], axis=1)
    return s_vecs, o_vecs


def segment_pool_objects(new_s: jax.Array, new_o: jax.Array,
                         edges: jax.Array, triple_mask: jax.Array,
                         num_objs: int, pooling: str = "avg") -> jax.Array:
    """Pool per-triple subject/object messages back onto objects.

    Equivalent of the reference scatter_add pooling with count-average
    (``graph.py:94-116``): each triple contributes its new subject vector to
    object ``s`` and its new object vector to object ``o``; with
    ``pooling='avg'`` sums are divided by per-object appearance counts
    clamped at 1.

    Args:
      new_s, new_o: (N, T, H) messages from net1.
      edges: (N, T, 2) local [s, o] indices.
      triple_mask: (N, T) validity of each triple slot.
      num_objs: O (padded object-axis length).
      pooling: 'avg' or 'sum'.

    Returns:
      (N, O, H) pooled object messages; objects in no triple get zeros
      (graph.py:113-115).
    """
    dtype = new_s.dtype
    tm = triple_mask.astype(dtype)[..., None]                     # (N,T,1)
    onehot_s = jax.nn.one_hot(edges[..., 0], num_objs, dtype=dtype) * tm
    onehot_o = jax.nn.one_hot(edges[..., 1], num_objs, dtype=dtype) * tm
    pooled = (jnp.einsum("nto,nth->noh", onehot_s, new_s,
                         preferred_element_type=dtype)
              + jnp.einsum("nto,nth->noh", onehot_o, new_o,
                           preferred_element_type=dtype))
    if pooling == "avg":
        counts = onehot_s.sum(axis=1) + onehot_o.sum(axis=1)      # (N,O)
        counts = jnp.maximum(counts, 1.0)
        pooled = pooled / counts[..., None]
    elif pooling != "sum":
        raise ValueError(f"Invalid pooling '{pooling}'")
    return pooled
