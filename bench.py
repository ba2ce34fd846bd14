"""Benchmark: TBSRN (flagship SR generator) inference throughput on TPU.

Mirrors the reference's own headline metric — images/sec over the SR test
pass, `fps = sum_images / (time_end - time_begin)`
(scene-text-telescope/interfaces/super_resolution.py:324-328) — on the
TextZoom geometry (LR 16x64 -> HR 32x128), full-size model (srb_nums=5,
hidden_units=32), bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured images/sec divided by REF_GPU_FPS, an estimate
of the reference PyTorch TBSRN on one V100-class GPU anchored by a
measurement of the reference model on this host's CPU (0.90 img/s,
1 core) and a FLOP-based scaling chain — see "REF_GPU_FPS derivation" in
BASELINE.md. The driver's north-star is vs_baseline >= 5.
"""

import json
import time

import jax
import jax.numpy as jnp

from bench_util import analytic_flops, mfu as mfu_of, require_device, xla_flops

REF_GPU_FPS = 1000.0  # estimated reference TBSRN images/sec on 1 GPU
BATCH = 2048          # throughput knee (BENCH_SWEEP_r03.json: +2% over 512)
ITERS = 20


def main():
    require_device()
    from fudanocr_tpu.models.sr import TBSRN

    model = TBSRN(scale_factor=2, width=128, height=32, stn=True,
                  srb_nums=5, hidden_units=32, dtype=jnp.bfloat16)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 16, 64, 3),
                            jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)

    # The remote-TPU tunnel makes per-dispatch host timing unreliable
    # (async futures + network roundtrips), so the iteration loop runs
    # INSIDE one jit as a lax.scan with a true data dependency: each SR
    # output is 2x-subsampled back into the next LR input. One host fetch
    # at the end bounds the total device time.
    def chain(variables, x):
        def body(x, _):
            y = model.apply(variables, x)
            nxt = y[:, ::2, ::2, :].astype(jnp.float32)
            return nxt, y.astype(jnp.float32).mean()
        _, means = jax.lax.scan(body, x, None, length=ITERS)
        return means

    compiled = jax.jit(chain).lower(variables, x0).compile()
    # analytic per-forward flops (bench_util: jaxpr walk, Pallas kernels
    # credited via their CostEstimate; the raw cost_analysis counts a
    # scan body ONCE so it is only printed as a cross-check). Counted on
    # the PLAIN-math variant of the model — the lane-packed RGB head
    # multiplies structural zeros (ops/wide_conv.py) and the fused
    # enhancer hoists the batch-constant PE-qkv term, so the optimized
    # program's own flop count would respectively over- and under-state
    # the algorithm's work. Same convention as flash-attention MFU:
    # numerator = standard-algorithm flops, denominator = measured time.
    plain = TBSRN(scale_factor=2, width=128, height=32, stn=True,
                  srb_nums=5, hidden_units=32, dtype=jnp.bfloat16,
                  fused_enhancer=False, wide_out_block=0)
    fwd_flops = analytic_flops(
        lambda v, x: plain.apply(v, x), variables, x0)["flops"]
    compiled(variables, x0)[0].item()  # warm

    t0 = time.perf_counter()
    means = compiled(variables, x0)
    float(means[-1])  # host fetch forces completion
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "tbsrn_textzoom_sr_inference",
        "value": round(fps, 1),
        "unit": "images/sec/chip",
        "mfu": round(mfu_of(fwd_flops, dt / ITERS), 4),
        "gflops_per_image": round(fwd_flops / BATCH / 1e9, 3),
        "xla_flops_scan_body": xla_flops(compiled),
        "vs_baseline": round(fps / REF_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
