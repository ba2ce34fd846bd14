#!/bin/sh
# Run the full bench battery SERIALIZED and write round-stamped artifacts.
# Usage: sh scripts/record_bench.sh <round>   (e.g. 3 -> BENCH_TRAIN_r03.json)
# Run from the repo root with the TPU tunnel up and NOTHING else on the
# host (host-side timing contends for the 1 CPU core).
set -e
[ -n "$1" ] || { echo "usage: sh scripts/record_bench.sh <round>" >&2; exit 2; }
N=$(printf '%02d' "$1")
set -x
python bench_train.py > "BENCH_TRAIN_r$N.json"
python bench_ctr.py   > "BENCH_CTR_r$N.json"
python bench_clip.py  > "BENCH_CLIP_r$N.json"
python bench_seg.py   > "BENCH_SEG_r$N.json"
python bench_pipe.py  > "BENCH_PIPE_r$N.json"
PYTHONPATH=/root/.axon_site:. python scripts/bench_tsrn_gru.py > "BENCH_TSRN_r$N.json" || true
# no pipe: POSIX sh has no pipefail, and a pipe would mask bench.py's rc
python bench.py       > "/tmp/bench_headline_r$N.json"
set +x
cat "/tmp/bench_headline_r$N.json"
echo "artifacts written: BENCH_{TRAIN,CTR,CLIP,SEG,PIPE,TSRN}_r$N.json (headline stays the driver's)"
