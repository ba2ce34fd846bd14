"""Round-4 on-chip A/B: whole-SRB kernel vs fused-enhancer, + bench glue.

Variants at the flagship config (B=512/2048, TextZoom LR 16x64, bf16):
  enh   : round-3 default (fused_enhancer=True)
  srb   : whole-SRB kernel (fused_srb=True)
  *_lite: same, with lighter chain glue (contiguous crop instead of a
          strided subsample; one final mean instead of per-iter means)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_srb_r4.py
"""

import time

import jax
import jax.numpy as jnp

from fudanocr_tpu.models.sr import TBSRN

ITERS = 20


def run(name, batch, glue, **kw):
    model = TBSRN(scale_factor=2, width=128, height=32, stn=True,
                  srb_nums=5, hidden_units=32, dtype=jnp.bfloat16, **kw)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 16, 64, 3),
                            jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

    if glue == "old":
        def chain(variables, x):
            def body(x, _):
                y = model.apply(variables, x)
                return (y[:, ::2, ::2, :].astype(jnp.float32),
                        y.astype(jnp.float32).mean())
            _, means = jax.lax.scan(body, x, None, length=ITERS)
            return means[-1]
    else:
        def chain(variables, x):
            def body(x, _):
                y = model.apply(variables, x)
                return jax.lax.slice(
                    y, (0, 0, 0, 0), (batch, 16, 64, 3)).astype(jnp.float32), None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x.mean()

    compiled = jax.jit(chain).lower(variables, x0).compile()
    float(compiled(variables, x0))  # warm
    t0 = time.perf_counter()
    float(compiled(variables, x0))
    dt = time.perf_counter() - t0
    print(f"{name:14s} B={batch:5d} {dt / ITERS * 1e3:8.3f} ms/fwd "
          f"{batch * ITERS / dt:9.1f} img/s", flush=True)


def main():
    for batch in (512, 2048):
        run("enh", batch, "old", fused_enhancer=True)
        run("srb", batch, "old", fused_enhancer=True, fused_srb=True)
        run("srb_lite", batch, "lite", fused_enhancer=True, fused_srb=True)
        run("enh_lite", batch, "lite", fused_enhancer=True)


if __name__ == "__main__":
    main()
