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


def _worker_get(index: int):
    return _worker_dataset[index]


class DataLoader:
    def __init__(self, dataset, batch_size: int, max_objs: int,
                 max_triples: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2,
                 worker_type: str = "thread"):
        assert worker_type in ("thread", "process")
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_objs = max_objs
        self.max_triples = max_triples
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.worker_type = worker_type
        self._process_pool = None
        self._rng = np.random.RandomState(seed)

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

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # One IPC round trip per worker (not per example) in process mode.
        chunk = max(1, self.batch_size // self.num_workers)

        def produce_with(pool, fetch):
            for idxs in batches:
                if stop.is_set():
                    return
                examples = list(pool.map(fetch, idxs, chunksize=chunk))
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
                    produce_with(pool, self.dataset.__getitem__)
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
    ``depth`` batches while the current one runs (transfers are async)."""
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
