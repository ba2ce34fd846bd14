"""Shared helpers for parsing jax.profiler perfetto traces on axon.

The tunnel supports start/stop_trace; the dump is a gzipped chrome trace.
Group device-side complete ('X') events by op-family (name with trailing
digits/dots stripped) so op-soup graphs summarize meaningfully.
"""

import glob
import gzip
import json
import re
from collections import defaultdict


def load_trace(outdir: str) -> dict:
    paths = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {outdir}"
    with gzip.open(max(paths, key=len), "rt") as f:
        return json.load(f)


def device_summary(trace: dict, top: int = 40) -> None:
    pidname = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pidname[ev["pid"]] = ev["args"].get("name", "?")
    agg = defaultdict(lambda: [0.0, 0])
    pid_tot = defaultdict(float)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and "dur" in ev:
            pn = pidname.get(ev["pid"], str(ev["pid"]))
            pid_tot[pn] += ev["dur"]
            if "TPU" in pn or "device" in pn.lower():
                root = re.sub(r"[.\d]+$", "", ev.get("name", "?"))
                agg[root][0] += ev["dur"]
                agg[root][1] += 1
    print("per-process totals (us):")
    for k, v in sorted(pid_tot.items(), key=lambda kv: -kv[1]):
        print(f"  {v:12.0f}  {k}")
    print("\ndevice ops grouped (us_total, count):")
    for k, (us, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {us:12.0f} {n:6d}  {k}")
