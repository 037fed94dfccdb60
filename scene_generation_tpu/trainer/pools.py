"""Device-side per-class appearance-vector replay pool.

Reference ``VectorPool`` (utils.py:62-90) is a host-side dict of python
lists, queried with a ``.cpu()`` round-trip every step (a device sync). Here
the pool lives on-device as dense arrays inside the train state, so the
whole step stays jitted:

  vecs   (num_classes, pool_size, rep_size)
  counts (num_classes,) int32

``pool_query`` returns, per object, a previously stored vector of the same
class (or the object's own vector while its class pool is empty) and inserts
the current (stop-gradient) vector — reference semantics (utils.py:67-90)
with one documented divergence: same-class objects within one batch are
processed in parallel where the reference processes them sequentially.
Precisely:

  * BELOW capacity, a within-batch rank gives each same-class object a
    distinct append slot — no entries are lost (matches the reference).
  * AT capacity, the random slot is drawn as (per-class random base +
    within-batch rank) mod count, so same-class objects read AND overwrite
    DISTINCT slots: no insert is ever lost to a colliding write (for k <=
    count same-class objects; k > pool_size wraps, which the 100-slot pool
    never sees at MAX_OBJS*batch scales). Each object's read is still
    uniform over the existing entries; the residual divergence is that
    same-class reads within one batch are correlated (distinct, base-offset
    slots rather than independent draws) and an object can never read a
    SAME-BATCH neighbor's fresh insert, which the reference's sequential
    read-then-replace allows.

The pool is a training heuristic feeding the "wrong texture" negative
(model.py:170); this divergence does not affect exactness-critical paths.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VectorPoolState(NamedTuple):
    vecs: jax.Array     # (C, P, R)
    counts: jax.Array   # (C,) int32


def create_pool(num_classes: int, pool_size: int, rep_size: int,
                dtype=jnp.float32) -> VectorPoolState:
    return VectorPoolState(
        vecs=jnp.zeros((num_classes, pool_size, rep_size), dtype),
        counts=jnp.zeros((num_classes,), jnp.int32))


def pool_query(state: VectorPoolState, rng: jax.Array, objs: jax.Array,
               reprs: jax.Array, obj_mask: jax.Array
               ) -> Tuple[jax.Array, VectorPoolState]:
    """Query + update the pool for a flat batch of objects.

    Args:
      objs: (B,) int class ids.
      reprs: (B, R) current appearance vectors (will be stop-gradiented).
      obj_mask: (B,) validity; invalid slots neither read nor write.

    Returns:
      (wrong_reprs (B, R), new_state).
    """
    num_classes, pool_size, _ = state.vecs.shape
    b = objs.shape[0]
    reprs = jax.lax.stop_gradient(reprs)
    valid = obj_mask.astype(bool)

    counts_per_obj = state.counts[objs]                          # (B,)
    one_hot = jax.nn.one_hot(objs, num_classes, dtype=jnp.int32) \
        * valid[:, None].astype(jnp.int32)
    rank = jnp.take_along_axis(jnp.cumsum(one_hot, axis=0) - one_hot,
                               objs[:, None], axis=1)[:, 0]      # (B,)
    # Random read slot among the existing entries (utils.py:81,85), drawn
    # as (per-class base + within-batch rank) mod count: uniform per object,
    # but DISTINCT across same-class objects so at-capacity overwrites (which
    # reuse the read slot) never collide.
    base = jax.random.randint(rng, (num_classes,), 0,
                              jnp.maximum(state.counts, 1))
    read_slot = (base[objs] + rank) % jnp.maximum(counts_per_obj, 1)
    read_slot = jnp.clip(read_slot, 0, pool_size - 1)
    stored = state.vecs[objs, read_slot]                         # (B, R)
    empty = counts_per_obj == 0
    wrong = jnp.where(empty[:, None], reprs, stored)

    # Insert slot: append while below capacity (rank keeps same-class append
    # slots distinct), else overwrite the read slot (utils.py:82-88).
    append_slot = counts_per_obj + rank
    write_slot = jnp.where(append_slot < pool_size, append_slot, read_slot)
    write_slot = jnp.clip(write_slot, 0, pool_size - 1)

    # Drop writes for invalid objects by pushing the class index out of range.
    write_cls = jnp.where(valid, objs, num_classes)
    new_vecs = state.vecs.at[write_cls, write_slot].set(
        reprs.astype(state.vecs.dtype), mode="drop")
    new_counts = jnp.minimum(
        state.counts + one_hot.sum(axis=0), pool_size)
    return wrong.astype(reprs.dtype), VectorPoolState(new_vecs, new_counts)
