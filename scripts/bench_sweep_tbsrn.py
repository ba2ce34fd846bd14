"""Sweep TBSRN inference batch size on the chip (bench.py's flagship
config at several batches) to find the throughput knee.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sweep_tbsrn.py
Prints one JSON line per batch. Run SERIALIZED (nothing else on the host
during the timed phase — see axon notes in scripts/bench_all.sh).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_util import analytic_flops, mfu as mfu_of, require_device  # noqa: E402

ITERS = 20
BATCHES = (256, 512, 1024, 2048)


def main():
    require_device()
    from fudanocr_tpu.models.sr import TBSRN

    for fused, batch in [(f, b) for f in (False, True) for b in BATCHES]:
        model = TBSRN(scale_factor=2, width=128, height=32, stn=True,
                      srb_nums=5, hidden_units=32, dtype=jnp.bfloat16,
                      fused_enhancer=fused)
        x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 16, 64, 3),
                                jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

        def chain(variables, x):
            def body(x, _):
                y = model.apply(variables, x)
                return (y[:, ::2, ::2, :].astype(jnp.float32),
                        y.astype(jnp.float32).mean())
            _, means = jax.lax.scan(body, x, None, length=ITERS)
            return means

        compiled = jax.jit(chain).lower(variables, x0).compile()
        fwd_flops = analytic_flops(
            lambda v, x: model.apply(v, x), variables, x0)["flops"]
        compiled(variables, x0)[0].item()  # warm
        t0 = time.perf_counter()
        means = compiled(variables, x0)
        float(means[-1])
        dt = time.perf_counter() - t0
        fps = batch * ITERS / dt
        print(json.dumps({
            "metric": "tbsrn_sr_inference_sweep",
            "fused_enhancer": fused,
            "batch": batch,
            "value": round(fps, 1),
            "unit": "images/sec/chip",
            "ms_per_batch": round(dt / ITERS * 1e3, 2),
            "mfu": round(mfu_of(fwd_flops, dt / ITERS), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
