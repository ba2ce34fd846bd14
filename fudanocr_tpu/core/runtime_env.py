"""Host runtime-environment knobs (mmseg/utils/set_env.py:11-56
`setup_multi_processes` equivalent).

The reference pins the multiprocessing start method and caps cv2/OMP/MKL
thread pools so DataLoader workers don't oversubscribe the host. The TPU
rebuild's data path is thread-based (data/prefetch.py), but the same
knobs matter on small hosts (this environment's host has ONE core): an
unbounded cv2 pool actively hurts. Config keys mirror the reference:
`opencv_num_threads`, `omp_num_threads`, `mkl_num_threads`,
`mp_start_method`.
"""

from __future__ import annotations

import logging
import os
import platform

log = logging.getLogger("fudanocr_tpu.runtime_env")


def setup_multi_processes(cfg) -> None:
    """Apply host-threading knobs from a config mapping (`cfg.get`-able)."""
    if platform.system() != "Windows":
        method = cfg.get("mp_start_method", None)
        if method in ("fork", "spawn", "forkserver"):
            import multiprocessing as mp

            log.info("setting multiprocessing start method to %r", method)
            mp.set_start_method(method, force=True)

    n_cv2 = cfg.get("opencv_num_threads", None)
    if isinstance(n_cv2, int):
        try:
            import cv2

            cv2.setNumThreads(n_cv2)
            log.info("cv2 num_threads = %d", n_cv2)
        except ImportError:
            pass

    for key, env in (("omp_num_threads", "OMP_NUM_THREADS"),
                     ("mkl_num_threads", "MKL_NUM_THREADS")):
        val = cfg.get(key, None)
        if isinstance(val, int) and env not in os.environ:
            os.environ[env] = str(val)
            log.info("%s = %d", env, val)
