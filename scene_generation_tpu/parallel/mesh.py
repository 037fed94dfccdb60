"""Device mesh + sharding for data-parallel training.

The reference has no distributed backend at all (single GPU, unconditional
``.cuda()``; SURVEY.md §2 "Parallelism"). TPU-native plan (SURVEY.md §5):
one ``Mesh(('data',))`` spanning all chips; the global batch is sharded on
'data', parameters/optimizer state are replicated, and XLA/GSPMD inserts the
gradient all-reduces — no hand-written collectives. BatchNorm statistics are
global-batch means under GSPMD, i.e. cross-replica BN for free.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``;
``jax.devices()`` then spans the slice and the same code path shards over
ICI within a slice and DCN across slices.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scene_generation_tpu.data.batching import Batch


def create_mesh(n_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for any array whose leading axis is the batch."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Batch, mesh: Mesh, axis_name: str = "data") -> Batch:
    """Device-put every field sharded on its leading (image) axis."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state/pool) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)
