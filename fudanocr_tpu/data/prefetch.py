"""Asynchronous host->device data pipeline.

The reference overlaps decode with compute via DataLoader worker processes
(num_workers=8, scene-text-telescope/interfaces/base.py:91-110). Here a
background thread runs the host-side pipeline (LMDB read + PIL decode +
collate) while the device executes the previous step, and `device_put`
starts the H2D transfer early so batches are HBM-resident when the step
needs them — the double-buffering half of SURVEY.md §7.7.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap a host batch iterator; stage `buffer_size` device batches ahead.

    `transform` maps the raw host batch to a pytree of arrays (e.g. label
    encoding); the pytree is device_put with `sharding` (or default)."""

    def __init__(self, batches: Iterator, transform: Optional[Callable] = None,
                 sharding=None, buffer_size: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._transform = transform or (lambda b: b)
        self._sharding = sharding
        self._err = None

        def worker():
            try:
                for batch in batches:
                    tree = self._transform(batch)
                    if self._sharding is not None:
                        tree = jax.tree_util.tree_map(
                            lambda x: jax.device_put(x, self._sharding), tree)
                    else:
                        tree = jax.tree_util.tree_map(jax.device_put, tree)
                    self._q.put(tree)
            except Exception as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(batches, transform=None, sharding=None, buffer_size: int = 2):
    return PrefetchIterator(batches, transform, sharding, buffer_size)
