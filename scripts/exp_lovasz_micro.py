"""Micro-bench: Lovász value+grad alone, sort vs bucketed variants.

Times ONLY jax.value_and_grad(lovasz)(logits) chained on-chip, isolating
the loss from the rest of the train step, at the two shapes the train
benches use: plain 512^2 B2 (P = 0.5M) and det 1024^2 B8 (P = 8.4M).
Decides the lovasz_impl='auto' threshold with per-call numbers.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_lovasz_micro.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench_util import require_device  # noqa: E402

ITERS = 8


def main():
    require_device()
    from fudanocr_tpu.losses.seg_losses import (lovasz_softmax_bucketed,
                                                lovasz_softmax_loss)

    shapes = {"p0.5M_512b2": (2, 512, 512), "p8.4M_1024b8": (8, 1024, 1024)}
    impls = {
        "sort": lovasz_softmax_loss,
        "bucketed_k1024": lovasz_softmax_bucketed,
        "bucketed_k4096": functools.partial(lovasz_softmax_bucketed,
                                            num_buckets=4096),
    }
    for sname, (b, h, w) in shapes.items():
        logits = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 2),
                                   jnp.float32)
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (b, h, w))
                  > 0.7).astype(jnp.int32)
        for iname, fn in impls.items():
            def chain(lg, lb):
                def body(x, _):
                    v, g = jax.value_and_grad(lambda l: fn(l, lb))(x)
                    return x + 1e-6 * g, v
                _, vs = jax.lax.scan(body, lg, None, length=ITERS)
                return vs

            compiled = jax.jit(chain).lower(logits, labels).compile()
            float(compiled(logits, labels)[-1])
            t0 = time.perf_counter()
            v = float(compiled(logits, labels)[-1])
            dt = (time.perf_counter() - t0) / ITERS
            print(json.dumps({"shape": sname, "impl": iname,
                              "ms_per_valgrad": round(dt * 1e3, 2),
                              "loss": round(v, 5)}), flush=True)


if __name__ == "__main__":
    main()
