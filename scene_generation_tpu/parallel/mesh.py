"""Device mesh + sharding for data-parallel training.

The reference has no distributed backend at all (single GPU, unconditional
``.cuda()``; SURVEY.md §2 "Parallelism"). TPU-native plan (SURVEY.md §5):
one ``Mesh(('data',))`` spanning all chips; the global batch is sharded on
'data', parameters/optimizer state are replicated, and XLA/GSPMD inserts the
gradient all-reduces — no hand-written collectives. BatchNorm statistics are
global-batch means under GSPMD, i.e. cross-replica BN for free.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``;
``jax.devices()`` then spans the slice and the same step shards over ICI
within a slice and DCN across slices. Host-side, each process loads only
its 1/num_processes slice of every global batch (``DataLoader(...,
process_count, process_index)``) and ``shard_batch`` assembles the global
jax.Array from the process-local pieces with
``jax.make_array_from_process_local_data`` — a plain ``device_put`` onto a
multi-process mesh would throw on non-addressable devices. Proven by the
spawned 2-process CPU test in tests/test_multihost.py.
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
        if jax.process_count() > 1 and n_devices != len(devices):
            # Slicing a device prefix on >1 process would strand whole
            # processes outside the mesh; multi-host DP always spans all.
            raise ValueError(
                f"multi-host mesh must span all {len(devices)} devices; "
                f"got n_devices={n_devices}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for any array whose leading axis is the batch."""
    return NamedSharding(mesh, P(axis_name))


def global_put(x, sharding: NamedSharding):
    """Place one host array under ``sharding``, multi-host safe.

    Single process: plain (async) ``device_put``. Multi-process: ``x`` is
    this process's local portion along any process-sharded axis (the full
    value for replicated specs) and the global jax.Array is assembled from
    the per-process pieces without any cross-host data movement.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    if sharding.spec == P():
        return jax.make_array_from_process_local_data(sharding, x, x.shape)
    return jax.make_array_from_process_local_data(sharding, x)


def shard_batch(batch: Batch, mesh: Mesh, axis_name: str = "data") -> Batch:
    """Assemble a global batch sharded on its leading (image) axis.

    On one process every field is ``device_put`` sharded; on many, each
    process contributes the local slice its DataLoader produced (see
    data/loader.py process_count/process_index) and the result is the
    concatenated global batch.
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: global_put(x, sh), batch)


def local_slice(x, n: int = 1):
    """First ``n`` examples from the locally-addressable part of ``x``.

    Host-side logging/visualization only needs a sample image; on >1
    process the batch/metrics leaves are global jax.Arrays spanning
    non-addressable devices, and eager indexing (or fetching) them from
    process 0 alone raises. Taking the first LOCAL shard's slice instead
    is multi-host safe (and a no-op pass-through single-process).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        x = x.addressable_shards[0].data
    return x[:n]


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state/pool) across the mesh.

    Multi-process: every process holds an identical host copy (same init
    rng + shapes), so the replicated global array is assembled from the
    local copies directly.
    """
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: global_put(x, sh), state)
