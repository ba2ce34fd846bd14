"""Observability: scalar/image logging, experiment bookkeeping, profiling.

Replaces the reference's three logging paths — python logging + TensorBoard
SummaryWriter (interfaces/base.py:73-87, super_resolution.py:74-77), plain
print + result files (sld/train.py:158-171), and mmcv TextLogger — with one
`MetricsLogger` that writes JSONL (always) and TensorBoard events (when the
`tensorboard` package is present). `Saver` reproduces the source-snapshot
bookkeeping (sld/util.py:144-173); `profile_trace` wraps jax.profiler for
the tracing story the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import shutil
import sys
import time
from typing import Dict, Optional

log = logging.getLogger("fudanocr_tpu")


class MetricsLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        # the tensorboard import drags in the TF proto stack (~20 s cold on
        # this 1-core host) — suites set FUDANOCR_TENSORBOARD=0 to skip it
        if os.environ.get("FUDANOCR_TENSORBOARD", "1") == "0":
            tensorboard = False
        if tensorboard:
            try:
                from tensorboard.summary.writer.event_file_writer import (
                    EventFileWriter)
                from tensorboard.compat.proto.summary_pb2 import Summary
                from tensorboard.compat.proto.event_pb2 import Event

                self._tb = EventFileWriter(log_dir)
                self._Summary = Summary
                self._Event = Event
            except Exception:  # pragma: no cover
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "time": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            s = self._Summary(
                value=[self._Summary.Value(tag=tag,
                                           simple_value=float(value))])
            self._tb.add_event(self._Event(summary=s, step=int(step),
                                           wall_time=time.time()))

    def scalars(self, metrics: Dict[str, float], step: int,
                prefix: str = ""):
        for k, v in metrics.items():
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def prediction_table(self, step: int, images, gts, preds,
                         palette=((0, 0, 0), (255, 64, 64)),
                         max_rows: int = 8):
        """The MMSegWandbHook prediction-table analog
        (mmseg/core/hook/wandblogger_hook.py:15-370) without wandb: write
        an (image | gt | pred) panel PNG per sample plus a JSONL index
        under <log_dir>/predictions/."""
        import numpy as np
        from PIL import Image

        out_dir = os.path.join(self.log_dir, "predictions")
        os.makedirs(out_dir, exist_ok=True)
        # extra gray entry renders ignore_index (255) pixels — padded
        # borders and don't-care regions must not display as the last class
        pal = np.concatenate([np.asarray(palette, np.uint8),
                              np.asarray([[128, 128, 128]], np.uint8)])
        ignore_slot = len(pal) - 1

        def colorize(labels):
            labels = np.asarray(labels)
            idx = np.where(labels == 255, ignore_slot,
                           np.clip(labels, 0, ignore_slot - 1))
            return pal[idx]

        rows = []
        for i in range(min(len(images), max_rows)):
            img = np.asarray(images[i])
            if img.dtype != np.uint8:
                lo, hi = float(img.min()), float(img.max())
                img = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
            gt = colorize(gts[i])
            pred = colorize(preds[i])
            panel = np.concatenate([img, gt, pred], axis=1)
            name = f"step{step:08d}_{i}.png"
            Image.fromarray(panel).save(os.path.join(out_dir, name))
            rows.append(name)
        self._jsonl.write(json.dumps(
            {"tag": "predictions", "step": int(step), "files": rows,
             "time": time.time()}) + "\n")
        self._jsonl.flush()
        return rows

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Saver:
    """Experiment bookkeeping: snapshot the exact entry-point sources into
    the run dir (sld/util.py:144-173 `saver()`)."""

    def __init__(self, history_dir: str, exp_name: str):
        self.run_dir = os.path.join(history_dir, exp_name)

    def check_exp_name(self, interactive: Optional[bool] = None) -> bool:
        """Overwrite guard (text-gestalt/interfaces/base.py:75-103): if the
        run dir already holds a snapshot, ask before clobbering when stdin
        is a tty, else refuse silently. Returns True if OK to proceed."""
        if not os.path.isdir(self.run_dir) or not os.listdir(self.run_dir):
            return True
        if interactive is None:
            interactive = sys.stdin.isatty()
        if not interactive:
            return False
        ans = input(f"experiment dir {self.run_dir} exists — "
                    "overwrite? [y/N] ")
        return ans.strip().lower() in ("y", "yes")

    def snapshot(self, *source_files: str):
        os.makedirs(self.run_dir, exist_ok=True)
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        open(os.path.join(self.run_dir, stamp), "w").close()
        for src in source_files:
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(self.run_dir,
                                                  os.path.basename(src)))
        return self.run_dir


def guard_run_dir(run_dir: str, sources=(), resume: bool = False) -> bool:
    """Entry-point wrapper for the overwrite guard + source snapshot
    (text-gestalt/interfaces/base.py:75-103): refuse to clobber an
    experiment dir that already holds results unless the user confirms
    (tty) or is resuming. Returns False when the caller should abort."""
    saver = Saver(os.path.dirname(run_dir) or ".", os.path.basename(run_dir))
    if not resume and not saver.check_exp_name():
        log.error("experiment dir %s already has contents — pass --resume, "
                  "confirm at the prompt, or choose another dir", run_dir)
        return False
    saver.snapshot(*sources)
    return True


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace for a code region (view with TensorBoard or
    Perfetto). Usage: `with profile_trace('/tmp/trace'): step(...)`."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """images/sec measurement with jax.block_until_ready, the TPU
    equivalent of the reference's fps probe (super_resolution.py:324-328)."""

    def __init__(self):
        self.t0 = None
        self.images = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.images = 0

    def step(self, batch_size: int):
        self.images += batch_size

    def stop(self, result=None) -> float:
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - self.t0
        return self.images / dt if dt > 0 else 0.0


class AverageMeter:
    """Running average (scene-text-telescope/utils/meters.py equivalent)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
