"""Multi-process host data loading (the reference's DataLoader workers).

The reference feeds its SR trainers with `DataLoader(num_workers=8)`
(scene-text-telescope/interfaces/base.py:91-110): worker processes run
LMDB read -> PIL decode -> resize -> collate while the GPUs compute.
This module is the TPU-side equivalent: a pool of worker processes, each
holding its own dataset instance (own LMDB mmap), producing collated
numpy batches IN ORDER, composed with data/prefetch.py's device staging
so H2D overlaps the device step.

Design:
  * the dataset is constructed INSIDE each worker from a picklable
    `factory` (mmap/file handles never cross process boundaries);
  * `Pool.imap(..., chunksize=1)` keeps batch order deterministic and
    pipelines: workers run ahead bounded by the pool's internal queue;
  * `num_workers=0` degrades to a synchronous in-process generator (the
    CI/test path, and the honest configuration on single-core hosts —
    this machine has 1 CPU, so extra workers only add IPC overhead;
    BENCH_PIPE artifacts record both).

Usage:
    factory = functools.partial(PairedLMDBDataset, "/data/textzoom",
                                batch_hw=(32, 128))
    loader = WorkerBatches(factory, batch_size=512, num_workers=8)
    for hr, lr, labels in loader:            # numpy, deterministic order
        ...
    loader = WorkerBatches(..., epochs=3)    # multi-epoch stream
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable, Optional, Sequence

_WORKER_DS = None
_WORKER_KW: dict = {}


def _init_worker(factory: Callable, collate_kw: dict):
    global _WORKER_DS, _WORKER_KW
    _WORKER_DS = factory()
    _WORKER_KW = collate_kw


def _make_batch(indices: Sequence[int]):
    return _WORKER_DS.collate(_WORKER_DS.fetch_items(indices), **_WORKER_KW)


class WorkerBatches:
    """Order-preserving multi-process batch stream over an LMDB dataset."""

    def __init__(self, factory: Callable, batch_size: int,
                 num_workers: int = 0, collate_kw: Optional[dict] = None,
                 epochs: int = 1, drop_last: bool = True,
                 indices: Optional[Sequence[int]] = None):
        self.factory = factory
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.collate_kw = collate_kw or {}
        self.epochs = epochs
        self.drop_last = drop_last
        self.indices = indices

    def _chunks(self):
        idx = self.indices
        if idx is None:
            n = len(self.factory())
            idx = range(n)
        for _ in range(self.epochs):
            for start in range(0, len(idx), self.batch_size):
                chunk = list(idx[start:start + self.batch_size])
                if len(chunk) < self.batch_size and self.drop_last:
                    continue
                yield chunk

    def __iter__(self):
        if self.num_workers <= 0:
            ds = self.factory()
            for chunk in self._chunks():
                yield ds.collate(ds.fetch_items(chunk), **self.collate_kw)
            return
        ctx = mp.get_context("fork")
        pool = ctx.Pool(self.num_workers, initializer=_init_worker,
                        initargs=(self.factory, self.collate_kw))
        try:
            yield from pool.imap(_make_batch, self._chunks(), chunksize=1)
        finally:
            pool.terminate()
            pool.join()
