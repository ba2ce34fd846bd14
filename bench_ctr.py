"""CTR-family benchmark: SLD train step + autoregressive greedy decode.

The shared OCRTransformer core (ResNet[3,4,6,3] -> 1024ch encoder +
1-layer decoder) is the workload of FOUR reference pillars (SLD,
image-ids-CTR, OI-CTR, ACPM — SURVEY.md §2.9). Two numbers at the SLD
recipe (stroke-level-decomposition/config.py: batch 32, 32x32 images,
max_len 30, Adadelta):

  * teacher-forced train step — images/sec/chip + MFU;
  * 30-step greedy decode (the reference's conv-cached eval loop,
    sld/train.py:110-121, here a fixed-length fori_loop that encodes
    once) — images/sec/chip.

Iterations are chained inside one jit (axon tunnel dispatch ~1.4 s/call
dwarfs the device step; see bench.py). Prints one JSON line per metric.
"""

import json
import time

import jax
import jax.numpy as jnp

from bench_util import analytic_flops, mfu as mfu_of, require_device, xla_flops

BATCH = 32
TRAIN_ITERS = 10
DECODE_ITERS = 4
MAX_LEN = 30

# Reference V100 estimates, anchored by a measured CPU run of the
# reference's own torch code (scripts/measure_ref_ctr_cpu.py: train
# 1.09 img/s, decode30 1.55 img/s on this 1-core host) scaled through
# the shared FLOP model — full chain in BASELINE.md
# "REF_GPU_CTR_* derivation".
REF_GPU_CTR_TRAIN_IPS = 65
REF_GPU_CTR_DECODE_IPS = 93


def main():
    require_device()
    import optax

    from fudanocr_tpu.core.mesh import make_mesh
    from fudanocr_tpu.models.rec.ocr_transformer import (OCRTransformer,
                                                         greedy_decode)
    from fudanocr_tpu.train.ctr import make_ctr_train_step
    from fudanocr_tpu.train.state import TrainState

    model = OCRTransformer(vocab=7, num_in=3, layers=(3, 4, 6, 3),
                           stage1_pool=False, dtype=jnp.bfloat16)
    mesh = make_mesh(jax.devices()[:1], data=1, model=1)
    img = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 32, 32, 3))
    text = jnp.zeros((BATCH, MAX_LEN), jnp.int32)
    lengths = jnp.full((BATCH,), MAX_LEN, jnp.int32)
    variables = jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(1), img, text, train=True)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.adadelta(1.0, rho=0.9, eps=1e-6))

    raw_step = make_ctr_train_step(model, mesh, wrap_jit=False)
    batch = {"image": img, "text_input": text, "text_gt": text,
             "lengths": lengths}

    def chain(state, batch, rng):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, loss = raw_step(st, batch, sub)
            return (st, r), loss
        (st, _), losses = jax.lax.scan(body, (state, rng), None,
                                       length=TRAIN_ITERS)
        return st, losses

    compiled = jax.jit(chain, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(2)).compile()
    step_flops = analytic_flops(raw_step, state, batch,
                                jax.random.PRNGKey(9))["flops"]
    state, losses = compiled(state, batch, jax.random.PRNGKey(2))
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = compiled(state, batch, jax.random.PRNGKey(2))
    float(losses[-1])
    dt = (time.perf_counter() - t0) / TRAIN_ITERS
    print(json.dumps({
        "metric": "sld_ctr_train_step",
        "value": round(BATCH / dt, 1),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1e3, 1),
        "mfu": round(mfu_of(step_flops, dt), 4),
        "gflops_per_step": round(step_flops / 1e9, 1),
        "xla_flops_scan_body": xla_flops(compiled),
        "vs_baseline": round(BATCH / dt / REF_GPU_CTR_TRAIN_IPS, 2),
    }))

    # ---- autoregressive eval (30 decode steps, conv encoded once) ----
    # variables are an ARGUMENT, not a closure: closed-over concrete arrays
    # are baked into the serialized module as dense constants, which blows
    # the axon remote-compile request cap (HTTP 413) at ResNet34 scale
    ivars = {"params": state.params, "batch_stats": state.batch_stats}

    def decode_chain(ivars, img):
        def body(x, _):
            ids = greedy_decode(model, ivars, x, MAX_LEN)
            # data dependency between iterations defeats CSE
            return x + 1e-12 * ids.sum().astype(x.dtype), ids[0, 0]
        _, outs = jax.lax.scan(body, img, None, length=DECODE_ITERS)
        return outs

    jdec = jax.jit(decode_chain).lower(ivars, img).compile()
    int(jdec(ivars, img)[-1])
    t0 = time.perf_counter()
    int(jdec(ivars, img)[-1])
    dt = (time.perf_counter() - t0) / DECODE_ITERS
    print(json.dumps({
        "metric": "sld_ctr_greedy_decode30",
        "value": round(BATCH / dt, 1),
        "unit": "images/sec/chip",
        "ms_per_batch": round(dt * 1e3, 1),
        "vs_baseline": round(BATCH / dt / REF_GPU_CTR_DECODE_IPS, 2),
    }))


if __name__ == "__main__":
    main()
