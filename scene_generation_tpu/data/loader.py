"""Threaded prefetching data loader producing padded Batches.

Replaces torch ``DataLoader`` + ``coco_collate_fn`` (train.py:60-77,
coco.py:501-547). Worker threads run ``dataset[i]`` (PIL decode + C++ RLE
rasterization release the GIL in their hot paths); a background assembler
keeps a bounded queue of device-ready Batches ahead of the training loop.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from scene_generation_tpu.data.batching import Batch, collate


class DataLoader:
    def __init__(self, dataset, batch_size: int, max_objs: int,
                 max_triples: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_objs = max_objs
        self.max_triples = max_triples
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)

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

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    examples = list(pool.map(self.dataset.__getitem__, idxs))
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
