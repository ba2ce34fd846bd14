#!/bin/sh
# Serialized TPU bench battery. Run from the repo root with the tunnel up:
#   nohup sh scripts/bench_all.sh > /tmp/bench_all.log 2>&1 &
# NEVER run anything else (pytest, compiles) while this is in a timed
# phase — host-side perf_counter timing contends for the 1 CPU core and
# inflates step times ~4x (see axon-tpu-quirks).
set -x
python bench.py
python bench_train.py
python bench_ctr.py
python bench_seg.py
python bench_pipe.py
