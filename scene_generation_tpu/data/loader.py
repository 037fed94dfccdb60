"""Prefetching data loader producing padded Batches.

Replaces torch ``DataLoader`` + ``coco_collate_fn`` (train.py:60-77,
coco.py:501-547). Two worker modes:

  * ``worker_type="thread"`` (default): PIL decode + C++ RLE rasterization
    release the GIL in their hot paths, so threads suffice for cheap
    datasets (synthetic) and avoid any pickling.
  * ``worker_type="process"``: spawn-context worker processes for real
    training, where the training process itself competes for the GIL
    (dispatch thread, logging) — matches the reference's 4 worker
    processes (reference train.py:71-77). The dataset is shipped ONCE per
    worker via the pool initializer; workers never import jax.

Determinism (SURVEY.md §7 "deterministic per-epoch PRNG"): the epoch-e
shuffle comes from ``default_rng((seed, e))`` and every example fetch is
routed through ``dataset.get_example(index, epoch)`` when the dataset
provides it, so per-example randomness (scene-graph resampling, attribute
sampling) is a pure function of (dataset seed, epoch, index) — identical
across worker counts, worker types, and restarts (tests/test_loader.py).

Multi-host data parallelism: with ``process_count``/``process_index`` set
(from ``jax.process_count()``/``jax.process_index()``), every process
computes the SAME global shuffle (same seed) and loads only its contiguous
1/process_count slice of each global batch; ``parallel.shard_batch``
assembles the global jax.Array from those local pieces. The reference has
no equivalent (single GPU).

A background assembler keeps a bounded queue of device-ready Batches ahead
of the training loop either way.
"""
from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator

import numpy as np

from scene_generation_tpu.data.batching import Batch, collate

_worker_dataset = None


def _init_worker(dataset):
    global _worker_dataset
    _worker_dataset = dataset


def _fetch_example(dataset, task):
    index, epoch = task
    get = getattr(dataset, "get_example", None)
    if get is not None:
        return get(index, epoch)
    return dataset[index]


def _worker_get(task):
    return _fetch_example(_worker_dataset, task)


class DataLoader:
    def __init__(self, dataset, batch_size: int, max_objs: int,
                 max_triples: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2,
                 worker_type: str = "thread",
                 process_count: int = 1, process_index: int = 0):
        assert worker_type in ("thread", "process")
        assert 0 <= process_index < process_count
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"global batch_size {batch_size} must divide evenly "
                    f"across {process_count} processes")
            if not drop_last:
                raise ValueError(
                    "multi-process loading requires drop_last=True (a "
                    "ragged final batch cannot be split evenly)")
        self.dataset = dataset
        self.batch_size = batch_size          # GLOBAL batch size
        self.max_objs = max_objs
        self.max_triples = max_triples
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.worker_type = worker_type
        self.process_count = process_count
        self.process_index = process_index
        self.seed = seed
        self._epoch = 0
        self._process_pool = None

    def _pool(self):
        """Persistent spawn-context process pool (created lazily; spawn
        cost and the one-time dataset pickle amortize across epochs)."""
        if self._process_pool is None:
            self._process_pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_init_worker, initargs=(self.dataset,))
        return self._process_pool

    def close(self):
        if self._process_pool is not None:
            self._process_pool.shutdown(wait=False, cancel_futures=True)
            self._process_pool = None

    def set_epoch(self, epoch: int) -> None:
        """Align the next __iter__ with a specific epoch number (resume)."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        epoch = self._epoch
        self._epoch = epoch + 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # Derived per (seed, epoch) — NOT a mutated stream — so any
            # process / restart reproduces the same global order.
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.process_count > 1:
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            batches = [b[lo:lo + local] for b in batches]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # One IPC round trip per worker (not per example) in process mode.
        chunk = max(1, len(batches[0]) // self.num_workers) if batches else 1

        def produce_with(pool, fetch):
            for idxs in batches:
                if stop.is_set():
                    return
                tasks = [(int(i), epoch) for i in idxs]
                examples = list(pool.map(fetch, tasks, chunksize=chunk))
                batch = collate(examples, self.max_objs, self.max_triples)
                # Bounded put that honors stop: a blocking q.put would
                # wedge this thread (and the executor's atexit join,
                # hanging process exit) when the consumer breaks early.
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        def produce():
            if self.worker_type == "process":
                produce_with(self._pool(), _worker_get)
            else:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    produce_with(
                        pool, lambda t: _fetch_example(self.dataset, t))
            if not stop.is_set():
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Overlap host->device transfer with compute: device_put the next
    ``depth`` batches while the current one runs (transfers are async).
    Multi-host safe: placement goes through ``parallel.global_put`` (plain
    async device_put on one process; process-local assembly on many)."""
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        from scene_generation_tpu.parallel import global_put
        return jax.tree.map(lambda x: global_put(x, sharding), batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
