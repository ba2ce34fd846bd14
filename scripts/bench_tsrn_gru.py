"""TSRN inference A/B: lax.scan GRUs vs the Pallas BiGRU kernel.

TSRN (and text-gestalt, whose model is byte-identical in the reference)
runs 11 bidirectional spatial GRUs per forward — the GruBlock stack the
round-3 verdict flagged. bench.py's flagship TBSRN has NO live GRUs (the
reference constructs but never calls them, tbsrn.py:234,239 — confirmed
by profile, scripts/profile_tbsrn.py), so the GRU kernel's A/B lives
here, on the model that actually runs them.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_tsrn_gru.py
Prints one JSON line per variant/batch. Run SERIALIZED.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_util import analytic_flops, mfu as mfu_of, require_device  # noqa: E402

ITERS = 10
BATCHES = (256, 512)


def main():
    require_device()
    from fudanocr_tpu.models.sr import TSRN

    for fused, batch in [(f, b) for f in (False, True) for b in BATCHES]:
        model = TSRN(scale_factor=2, width=128, height=32, stn=True,
                     srb_nums=5, hidden_units=32, dtype=jnp.bfloat16,
                     fused_gru=fused)
        x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 16, 64, 3),
                                jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

        def chain(variables, x):
            def body(x, _):
                y = model.apply(variables, x)
                return y[:, ::2, ::2, :].astype(jnp.float32), None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x.mean()

        compiled = jax.jit(chain).lower(variables, x0).compile()
        plain = TSRN(scale_factor=2, width=128, height=32, stn=True,
                     srb_nums=5, hidden_units=32, dtype=jnp.bfloat16,
                     fused_gru=False)
        flops = analytic_flops(lambda v, x: plain.apply(v, x),
                               variables, x0)["flops"]
        float(compiled(variables, x0))  # warm
        t0 = time.perf_counter()
        float(compiled(variables, x0))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "tsrn_sr_inference",
            "fused_gru": fused,
            "batch": batch,
            "value": round(batch * ITERS / dt, 1),
            "unit": "images/sec/chip",
            "ms_per_batch": round(dt / ITERS * 1e3, 2),
            "mfu": round(mfu_of(flops, dt / ITERS), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
