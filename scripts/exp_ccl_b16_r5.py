"""Round-5 det-step probes: CCL cost in isolation + batch-16 det row.

The B=8 det-guided profile (r5, /tmp/det_trace_r5) shows `conditional`
at ~36.6 ms/step (10%) — the device CCL's early-exit while_loop — plus
the sorts at 51.6 ms (attacked separately). Two probes:

  1. instance_labels_device alone at the det map shape ((B, 256, 256)
     binary from random logits — the worst case the bench exercises:
     untrained det heads emit noise, many components) for B in {8};
     plus a variant with the iteration cap halved (scan rounds converge
     blobs fast; the cap only guards adversarial shapes).
  2. the full det-guided train step at batch 16 (the B=1..8 sweep showed
     MFU still rising at 8; HBM may allow 16).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_ccl_b16_r5.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench_util import analytic_flops, mfu as mfu_of, require_device  # noqa: E402

ITERS = 8


def main():
    require_device()
    from fudanocr_tpu.models.seg.det_guided import instance_labels_device

    # ---- probe 1: CCL alone on noise maps (worst case) and blob maps ----
    for name, thresh in (("noise30", 0.7), ("blobs", None)):
        b, h, w = 8, 256, 256
        if thresh is not None:
            tm = (jax.random.uniform(jax.random.PRNGKey(0), (b, h, w))
                  > thresh).astype(jnp.float32)
        else:
            yy, xx = jnp.mgrid[0:h, 0:w]
            blob = ((yy // 32 + xx // 32) % 2).astype(jnp.float32)
            tm = jnp.broadcast_to(blob, (b, h, w))

        def chain(tm):
            def body(x, _):
                lab = instance_labels_device(x)
                # data dependency without changing the partition
                return x + 0.0 * lab.mean(), lab.max()
            _, ms = jax.lax.scan(body, tm, None, length=ITERS)
            return ms

        compiled = jax.jit(chain).lower(tm).compile()
        float(compiled(tm)[-1])
        t0 = time.perf_counter()
        float(compiled(tm)[-1])
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"probe": "ccl_%s_8x256x256" % name,
                          "ms_per_call": round(dt * 1e3, 2)}), flush=True)

    # ---- probe 2: det-guided full train step at batch 16 ----
    from fudanocr_tpu.models.seg import (CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         SegformerHead)
    from fudanocr_tpu.core.mesh import make_mesh_for_batch
    from fudanocr_tpu.train.seg import make_seg_optimizer, make_seg_train_step
    from fudanocr_tpu.train.state import TrainState

    det = DetGuidedEncoderDecoder(
        backbone=CascadeMiTDetGuided(embed_dims=32, num_layers=(2, 2, 2, 2),
                                     dtype=jnp.bfloat16),
        decode_head=SegformerHead(num_classes=2, channels=256,
                                  dtype=jnp.bfloat16))
    b = 16
    img = jax.random.uniform(jax.random.PRNGKey(4), (b, 1024, 1024, 3),
                             jnp.float32)
    gt = jnp.zeros((b, 1024, 1024), jnp.int32)
    variables = jax.jit(det.init, static_argnames=("train",))(
        jax.random.PRNGKey(5), img, train=True)
    tx = make_seg_optimizer(variables["params"])
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_seg_train_step(det, make_mesh_for_batch(b),
                               {"ce": 1.0, "lovasz": 1.0},
                               det_loss_ratio=0.1, wrap_jit=False)
    batch = {"img": img, "gt_seg": gt, "gt_det": gt}
    DET_ITERS = 4

    def chain2(state, bt, rng):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, m = step(st, bt, sub)
            return (st, r), m["loss"]
        (st, _), losses = jax.lax.scan(body, (state, rng), None,
                                       length=DET_ITERS)
        return st, losses

    compiled = jax.jit(chain2, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(6)).compile()
    flops = analytic_flops(step, state, batch, jax.random.PRNGKey(9))["flops"]
    state, losses = compiled(state, batch, jax.random.PRNGKey(6))
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = compiled(state, batch, jax.random.PRNGKey(6))
    float(losses[-1])
    dt = (time.perf_counter() - t0) / DET_ITERS
    print(json.dumps({"probe": "det_1024_b16_train",
                      "img_s": round(b / dt, 2),
                      "ms_per_step": round(dt * 1e3, 1),
                      "mfu": round(mfu_of(flops, dt), 4)}), flush=True)


if __name__ == "__main__":
    main()
