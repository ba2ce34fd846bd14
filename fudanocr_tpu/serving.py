"""Batched inference serving: request queue -> padded bucket batches.

The reference has no serving story (each project's `--test` loop is the
only inference path); for production deployment the unit of TPU
efficiency is the BATCH, so this module provides the missing piece: a
thread-safe server that coalesces concurrent single-image requests into
fixed-bucket batches (static shapes -> one XLA compile per bucket, no
recompiles at serve time), pads the tail, and scatters results back to
per-request futures.

Usage:
    model = TBSRN(..., dtype=jnp.bfloat16)
    variables = ...  # trained / ported params
    srv = InferenceServer(lambda x: model.apply(variables, x),
                          buckets=(1, 8, 32, 128), max_wait_ms=5.0)
    fut = srv.submit(lr_image)          # (H, W, C) single image
    sr = fut.result()                   # blocks until the batch lands
    srv.close()

Design notes:
  * buckets must be sorted ascending; a flush runs either a FULL largest
    bucket (under load) or, once the first waiter's max_wait_ms budget
    expires, the smallest bucket that fits EVERY pending same-shape
    request, padded — so under load batches are full and under trickle
    traffic latency is bounded by ~max_wait_ms + one forward.
  * requests of different image shapes are served in same-shape runs
    (a shape change ends the batch; no request can poison another).
  * the batcher thread is the only caller of the jitted forward; JAX
    dispatch is not thread-safe-per-buffer-donation, and a single issuing
    thread also keeps request ordering deterministic.
  * padding replicates the first request's image (shape-stable garbage);
    padded outputs are dropped before scatter.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PixelsToStrings:
    """The composed OCR path in ONE jit: LR pixels -> SR -> bicubic
    32x100 -> CRNN -> greedy CTC argmax, all device-resident; the host
    does only the final id->string join.

    The reference runs these as separate model calls with host hops per
    batch (scene-text-telescope/interfaces/super_resolution.py:241-329:
    SR forward, then `get_crnn_pred` :143 re-dispatches the recognizer
    and decodes via utils_crnn.py:10). Here the whole pixels->ids program
    is one XLA computation, so intermediate SR images and logits never
    leave HBM and the only transfer is the [B, T] int32 argmax ids.

    Usage:
        pipe = PixelsToStrings(lambda x: sr_model.apply(sr_vars, x),
                               lambda x: crnn.apply(crnn_vars, x),
                               CTCLabelConverter(alphabet))
        texts = pipe(lr_batch)              # list[str], len B
        texts, sr = pipe(lr_batch, return_sr=True)
    `ids_fn` (batch -> [B, T] ids) is exposed for InferenceServer use:
        srv = InferenceServer(pipe.ids_fn, buckets=(1, 8, 32))
    """

    def __init__(self, sr_apply: Callable, rec_apply: Callable, converter,
                 rec_hw: Tuple[int, int] = (32, 100)):
        from fudanocr_tpu.eval.ctc import ctc_greedy_decode

        self.converter = converter
        h, w = rec_hw

        def ids_and_sr(lr):
            from fudanocr_tpu.models.rec.crnn import parse_crnn_input

            sr = sr_apply(lr)
            # the reference bicubics SR output to 32x100 and converts to
            # 1-channel gray before its CRNN(32,1,37,256)
            # (interfaces/base.py:310,319-325 parse_crnn_data)
            ids = ctc_greedy_decode(rec_apply(parse_crnn_input(sr, (h, w))))
            return ids, sr

        self._ids_and_sr = jax.jit(ids_and_sr)
        self.ids_fn = jax.jit(lambda lr: ids_and_sr(lr)[0])

    def __call__(self, lr_batch, return_sr: bool = False):
        ids, sr = self._ids_and_sr(jnp.asarray(lr_batch))
        texts = self.converter.decode_ids(np.asarray(ids))
        return (texts, sr) if return_sr else texts

    def decode_ids(self, ids) -> List[str]:
        """Host join for ids produced by `ids_fn` (e.g. via a server)."""
        return self.converter.decode_ids(np.asarray(ids))


class LMDBToStrings:
    """The complete serving journey as one overlapped pipeline:
    LMDB bytes -> LR-only decode (uint8) -> H2D -> [SR -> gray 32x100 ->
    CRNN -> greedy CTC] in ONE jit -> host string join.

    The reference runs this as separate scripts with host hops between
    every stage (super_resolution.py:241-329 SR, get_crnn_pred :143).
    Here the host decodes batch i+1 and joins batch i-1's strings while
    the device runs batch i (data/prefetch.py staging; the only
    transfers are uint8 LR batches in and [B, T] int32 ids out).
    Normalization runs on device (data/collate.py::normalize_uint8), so
    the wire format is raw bytes. Measured end-to-end on a 1-core host:
    5,564 img/s (BENCH_PIPE_r05.json `lmdb_to_strings_img_s`).

    Usage:
        pipe = LMDBToStrings(pixels_to_strings, "/data/textzoom_test",
                             batch_size=512)
        for texts in pipe:          # list[str] per batch, in order
            ...
    """

    def __init__(self, pixels_to_strings: PixelsToStrings, db_path: str,
                 batch_size: int = 512, voc_type: str = "lower",
                 batch_hw: Tuple[int, int] = (32, 128), scale: int = 2,
                 num_workers: int = 0, epochs: int = 1,
                 buffer_size: int = 3):
        from fudanocr_tpu.data.collate import normalize_uint8
        from fudanocr_tpu.data.lmdb_dataset import LRServingLMDBDataset
        from fudanocr_tpu.data.workers import WorkerBatches

        self._p2s = pixels_to_strings
        ids_fn = pixels_to_strings.ids_fn
        self._ids_fn = jax.jit(
            lambda x: ids_fn(normalize_uint8(x)))
        self._loader = WorkerBatches(
            lambda: LRServingLMDBDataset(db_path, voc_type=voc_type,
                                         batch_hw=batch_hw, scale=scale),
            batch_size, num_workers=num_workers, epochs=epochs)
        self._buffer_size = buffer_size

    def __iter__(self):
        from fudanocr_tpu.data.prefetch import prefetch

        stream = prefetch(iter(self._loader), transform=lambda b: b[0],
                          buffer_size=self._buffer_size)
        pending = None
        for lr_imgs in stream:
            if pending is not None:
                yield self._p2s.decode_ids(np.asarray(pending))
            pending = self._ids_fn(lr_imgs)
        if pending is not None:
            yield self._p2s.decode_ids(np.asarray(pending))


class InferenceServer:
    def __init__(self, apply_fn: Callable, buckets: Sequence[int] = (1, 8, 32),
                 max_wait_ms: float = 5.0):
        if list(buckets) != sorted(set(int(b) for b in buckets)):
            raise ValueError(f"buckets must be ascending unique: {buckets}")
        self._apply = jax.jit(apply_fn)
        self.buckets = tuple(int(b) for b in buckets)
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[Tuple[np.ndarray, Future]]" = queue.Queue()
        self._closed = threading.Event()
        self._submit_lock = threading.Lock()  # serializes submit vs close
        import collections
        # bounded stats history: a long-lived server must not grow host RAM
        # with its request count (10k samples keep percentiles meaningful)
        self.batch_sizes = collections.deque(maxlen=10_000)  # buckets run
        self.latencies_ms = collections.deque(maxlen=10_000)  # submit->result
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image) -> Future:
        """Enqueue one (H, W, C) image; resolves to its (H', W', C') output."""
        # the closed-check and the put must be atomic w.r.t. close():
        # otherwise a submit that passes the check can enqueue after the
        # post-join drain finished, stranding its Future forever
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError("server is closed")
            fut: Future = Future()
            fut._enqueued_at = time.perf_counter()  # for stats()
            self._q.put((np.asarray(image), fut))
        return fut

    def warmup(self, example_image) -> None:
        """Pre-compile every bucket shape so serve-time requests never pay
        an XLA compile (first compile over a remote TPU link can be tens of
        seconds — far beyond any max_wait_ms budget)."""
        x1 = np.asarray(example_image)[None]
        for b in self.buckets:
            x = np.repeat(x1, b, axis=0)
            jax.block_until_ready(self._apply(jnp.asarray(x)))

    def stats(self) -> dict:
        """Request latencies (ms, submit -> result) and batch-size usage
        over the last <=10k requests (bounded history)."""
        lat = sorted(self.latencies_ms)
        if not lat:
            return {"requests": 0, "batches": list(self.batch_sizes)}
        pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
        return {"requests": len(lat), "p50_ms": round(pick(0.50), 3),
                "p99_ms": round(pick(0.99), 3),
                "max_ms": round(lat[-1], 3),
                "batches": list(self.batch_sizes)}

    def close(self):
        with self._submit_lock:
            self._closed.set()
        self._thread.join()
        # a submit() racing close() can enqueue after the batcher exits;
        # fail those futures instead of leaving clients blocked forever
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("server closed before serving"))

    # -- batcher ----------------------------------------------------------
    def _loop(self):
        pending: list = []
        deadline = None  # max_wait clock starts at the FIRST pending item
        while not (self._closed.is_set() and self._q.empty() and not pending):
            if pending:
                timeout = max(deadline - time.perf_counter(), 1e-4)
            else:
                timeout = 0.05
            try:
                item = self._q.get(timeout=timeout)
                if not pending:
                    deadline = time.perf_counter() + self.max_wait
                pending.append(item)
                while len(pending) < self.buckets[-1]:
                    pending.append(self._q.get_nowait())
            except queue.Empty:
                pass
            if not pending:
                continue
            # flush when a full largest-bucket is ready, the first waiter's
            # latency budget is spent, or we're draining on close
            if (len(pending) >= self.buckets[-1]
                    or time.perf_counter() >= deadline
                    or self._closed.is_set()):
                self._flush(pending)
                deadline = time.perf_counter() + self.max_wait

    def _flush(self, pending: list):
        # batch only the leading run of SAME-SHAPE requests: a mismatched
        # image must not poison its batchmates (and np.stack must never
        # raise outside the error-routing below)
        shape = pending[0][0].shape
        n = 1
        while n < len(pending) and pending[n][0].shape == shape:
            n += 1
        if n >= self.buckets[-1]:
            bucket = self.buckets[-1]           # a full largest bucket
        else:
            bucket = next(b for b in self.buckets if b >= n)  # pad up:
            # _flush only runs at deadline/full/close, so the whole run
            # must leave NOW — taking a smaller bucket would strand the
            # remainder for another max_wait each
        take = min(n, bucket)
        batch, futs = zip(*pending[:take])
        del pending[:take]
        self.batch_sizes.append(bucket)
        try:
            x = np.stack(batch)
            if take < bucket:  # pad the tail to the static bucket shape
                pad = np.repeat(x[:1], bucket - take, axis=0)
                x = np.concatenate([x, pad], axis=0)
            out = np.asarray(self._apply(jnp.asarray(x)))
            done = time.perf_counter()
            for i, fut in enumerate(futs):
                self.latencies_ms.append(
                    (done - getattr(fut, "_enqueued_at", done)) * 1e3)
                fut.set_result(out[i])
        except Exception as e:  # surface compile/runtime errors per-request
            for fut in futs:
                fut.set_exception(e)
