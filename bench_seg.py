"""Segmentation-stack benchmark: CascadeMiT-B0 + SegFormer head on TPU.

Three numbers, mirroring the reference's own recipes:
  * train step at 512^2 crops (textseg train pipeline crop,
    configs/_base_/datasets/textseg.py) — images/sec/chip + MFU;
  * DET-GUIDED (V10) train step at the published *_det recipe's crop
    1024^2 (configs/textformer/textformer-cascade-mit-b0_8x1_160k_
    textseg_det.py:49-75) — the reference-scale det pillar, runnable
    only because the region masks are evaluated in-kernel
    (ops/region_attention.py) instead of materialising the ~268 MB/image
    (B,1,65536,1024) additive masks;
  * slide inference, crop 1024^2 / stride 768^2 over a 1024x2048 canvas
    (test_cfg of every textformer config) — images/sec/chip + MFU.

MFU = (XLA cost-analysis flops per step) / elapsed / PEAK_BF16. The
reference's only citable in-repo seg latency is upstream SegFormer-B0 at
26.2 ms/im on V100 fp32 bs1 (text-focused-Transformers/configs/segformer/
segformer.yml:18-38); vs_baseline divides our slide-inference rate by
that (1/0.0262 = 38.2 img/s). See BASELINE.md.

Prints one JSON line per metric. bench.py (the driver's contract) stays
TBSRN-only; this file is the seg-stack counterpart.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from bench_util import analytic_flops, mfu as mfu_of, require_device, xla_flops

REF_V100_SEG_FPS = 38.2     # 26.2 ms/im SegFormer-B0 (segformer.yml:18-38)
# Reference V100 TRAIN estimate at the plain-textseg recipe (cascade-B0,
# 512^2 crop, CE+Lovasz, AdamW), anchored by a measured CPU run of the
# reference's own torch code (scripts/measure_ref_seg_cpu.py: 0.705
# img/s on this 1-core host) scaled through the shared FLOP model —
# full chain in BASELINE.md "REF_GPU_SEG_TRAIN_IPS derivation". The
# det-guided 1024^2 row derives its denominator from the same achieved
# V100 rate via the FLOP ratio (generous to the reference: it ignores
# the reference's per-step host cv2.findContours sync).
REF_GPU_SEG_TRAIN_IPS = 46       # plain B0 512^2, 76.3 GFLOP/im
REF_SEG_TRAIN_GFLOP_PER_IM = 76.3
TRAIN_BATCH = 2
TRAIN_ITERS = 8
INFER_ITERS = 8
# A/B override for the Lovász implementation in both train rows:
# LOVASZ_IMPL=sort|bucketed. 'sort' won or tied at every recipe shape in
# the r5 on-chip A/B (see train/seg.py), so it is the default; bucketed
# stays selectable as the recorded negative.
LOVASZ_IMPL = os.environ.get("LOVASZ_IMPL", "sort")


def _timed(jitted, args, iters) -> float:
    out = jitted(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    # one host fetch bounds device completion (axon tunnel: block_until_
    # ready alone is unreliable, see bench.py)
    jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean().item()
    return (time.perf_counter() - t0) / iters


def main():
    require_device()
    from fudanocr_tpu.models.seg import (CascadeMiT, EncoderDecoder,
                                         SegformerHead)
    from fudanocr_tpu.core.mesh import make_mesh_for_batch
    from fudanocr_tpu.models.seg.encoder_decoder import slide_inference
    from fudanocr_tpu.train.seg import make_seg_optimizer, make_seg_train_step
    from fudanocr_tpu.train.state import TrainState

    model = EncoderDecoder(
        backbone=CascadeMiT(embed_dims=32, num_layers=(2, 2, 2, 2),
                            dtype=jnp.bfloat16),
        decode_head=SegformerHead(num_classes=2, channels=256,
                                  dtype=jnp.bfloat16))

    # ---- train step @ 512^2 (batch 2 = historical row; batch 8 =
    # per-chip batching, the same play as the det sweep: the reference
    # recipe is 8 GPUs x batch 1, one chip batches up instead) ----
    for train_batch in (TRAIN_BATCH, 8):
        run_plain(model, train_batch)
    run_det_and_slide(model)


def run_plain(model, TRAIN_BATCH):
    from fudanocr_tpu.core.mesh import make_mesh_for_batch
    from fudanocr_tpu.train.seg import make_seg_optimizer, make_seg_train_step
    from fudanocr_tpu.train.state import TrainState

    img = jax.random.uniform(jax.random.PRNGKey(0),
                             (TRAIN_BATCH, 512, 512, 3), jnp.float32)
    gt = jnp.zeros((TRAIN_BATCH, 512, 512), jnp.int32)
    variables = jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(1), img, train=True)
    mesh = make_mesh_for_batch(TRAIN_BATCH)
    tx = make_seg_optimizer(variables["params"])
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    raw_step = make_seg_train_step(model, mesh, {"ce": 1.0, "lovasz": 1.0},
                                   wrap_jit=False, lovasz_impl=LOVASZ_IMPL)
    batch = {"img": img, "gt_seg": gt}

    # chain the iterations INSIDE one jit (lax.scan with the state as
    # carry): per-dispatch tunnel overhead is ~1.4 s/call on axon, ~20x
    # the 60 ms device step (profiled 2026-08-16), so a python-loop
    # benchmark measures the tunnel, not the TPU
    def chain(state, batch, rng):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, m = raw_step(st, batch, sub)
            return (st, r), m["loss"]
        (st, _), losses = jax.lax.scan(body, (state, rng), None,
                                       length=TRAIN_ITERS)
        return st, losses

    chained = jax.jit(chain, donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)
    # one compile serves cross-check cost analysis AND execution
    compiled = chained.lower(state, batch, rng).compile()
    step_flops = analytic_flops(raw_step, state, batch,
                                jax.random.PRNGKey(9))["flops"]
    state, losses = compiled(state, batch, rng)  # warm
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = compiled(state, batch, rng)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / TRAIN_ITERS
    print(json.dumps({
        "metric": "cascade_mit_b0_512_train",
        "lovasz": LOVASZ_IMPL,
        "batch": TRAIN_BATCH,
        "value": round(TRAIN_BATCH / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1e3, 1),
        "mfu": round(mfu_of(step_flops, dt), 4),
        "gflops_per_step": round(step_flops / 1e9, 1),
        "xla_flops_scan_body": xla_flops(compiled),
        "vs_baseline": round(TRAIN_BATCH / dt / REF_GPU_SEG_TRAIN_IPS, 2),
    }))

    return


def run_det_and_slide(model):
    from fudanocr_tpu.core.mesh import make_mesh_for_batch
    from fudanocr_tpu.models.seg.encoder_decoder import slide_inference
    from fudanocr_tpu.train.seg import make_seg_optimizer, make_seg_train_step
    from fudanocr_tpu.train.state import TrainState

    # ---- DET-GUIDED train step @ the published 1024^2 det recipe ----
    from fudanocr_tpu.models.seg import (CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         SegformerHead)

    det_model = DetGuidedEncoderDecoder(
        backbone=CascadeMiTDetGuided(embed_dims=32, num_layers=(2, 2, 2, 2),
                                     dtype=jnp.bfloat16),
        decode_head=SegformerHead(num_classes=2, channels=256,
                                  dtype=jnp.bfloat16))
    DET_ITERS = 4

    def run_det(det_batch):
        dimg = jax.random.uniform(jax.random.PRNGKey(4),
                                  (det_batch, 1024, 1024, 3), jnp.float32)
        dgt = jnp.zeros((det_batch, 1024, 1024), jnp.int32)
        ddet = jnp.zeros((det_batch, 1024, 1024), jnp.int32)
        dvars = jax.jit(det_model.init, static_argnames=("train",))(
            jax.random.PRNGKey(5), dimg, train=True)
        dmesh = make_mesh_for_batch(det_batch)
        dtx = make_seg_optimizer(dvars["params"])
        dstate = TrainState.create(dvars["params"],
                                   dvars.get("batch_stats", {}), dtx)
        det_step = make_seg_train_step(det_model, dmesh,
                                       {"ce": 1.0, "lovasz": 1.0},
                                       det_loss_ratio=0.1, wrap_jit=False,
                                       lovasz_impl=LOVASZ_IMPL)
        dbatch = {"img": dimg, "gt_seg": dgt, "gt_det": ddet}

        def det_chain(state, batch, rng):
            def body(carry, _):
                st, r = carry
                r, sub = jax.random.split(r)
                st, m = det_step(st, batch, sub)
                return (st, r), m["loss"]
            (st, _), losses = jax.lax.scan(body, (state, rng), None,
                                           length=DET_ITERS)
            return st, losses

        dchained = jax.jit(det_chain, donate_argnums=(0,))
        dcompiled = dchained.lower(dstate, dbatch,
                                   jax.random.PRNGKey(6)).compile()
        det_flops = analytic_flops(det_step, dstate, dbatch,
                                   jax.random.PRNGKey(9))["flops"]
        dstate, dlosses = dcompiled(dstate, dbatch, jax.random.PRNGKey(6))
        float(dlosses[-1])  # warm + completion fence
        t0 = time.perf_counter()
        dstate, dlosses = dcompiled(dstate, dbatch, jax.random.PRNGKey(6))
        float(dlosses[-1])
        dt = (time.perf_counter() - t0) / DET_ITERS
        print(json.dumps({
            "metric": "cascade_mit_b0_det_guided_1024_train",
            "lovasz": LOVASZ_IMPL,
            "batch": det_batch,
            "value": round(det_batch / dt, 2),
            "unit": "images/sec/chip",
            "ms_per_step": round(dt * 1e3, 1),
            "mfu": round(mfu_of(det_flops, dt), 4),
            "gflops_per_step": round(det_flops / 1e9, 1),
            # V100 det-guided estimate = plain-train achieved rate scaled
            # by the FLOP ratio (same achieved TFLOP/s on the bigger step)
            "vs_baseline": round(
                det_batch / dt / (REF_GPU_SEG_TRAIN_IPS *
                                  REF_SEG_TRAIN_GFLOP_PER_IM /
                                  (det_flops / det_batch / 1e9)), 2),
        }), flush=True)

    # reference det configs are 8x1 (batch 1/GPU); per-chip batching up is
    # how one chip matches the 8-GPU recipe (round-3 verdict weak #3):
    # sweep until HBM runs out
    for det_batch in (1, 2, 4, 8):
        try:
            run_det(det_batch)
        except Exception as e:  # OOM at some batch: report and stop
            print(json.dumps({
                "metric": "cascade_mit_b0_det_guided_1024_train",
                "batch": det_batch, "error": type(e).__name__}), flush=True)
            break

    # ---- slide inference, crop 1024^2 stride 768^2, canvas 1024x2048 ----
    iv0 = jax.jit(model.init)(jax.random.PRNGKey(1),
                              jnp.zeros((1, 512, 512, 3), jnp.float32))
    ivars = {"params": iv0["params"],
             "batch_stats": iv0.get("batch_stats", {})}
    big = jax.random.uniform(jax.random.PRNGKey(3), (1, 1024, 2048, 3),
                             jnp.float32)

    # ivars passed as an argument (closed-over concrete arrays get baked
    # into the serialized module as constants — see bench_ctr.py)
    def infer_chain(ivars, img):
        # data-dependent chaining defeats CSE and amortizes dispatch
        def body(x, _):
            out = slide_inference(lambda p: model.apply(ivars, p), x,
                                  (1024, 1024), (768, 768))
            return x + 1e-12 * out.mean(), out.mean()
        _, outs = jax.lax.scan(body, img, None, length=INFER_ITERS)
        return outs

    jinfer = jax.jit(infer_chain).lower(ivars, big).compile()
    iflops = analytic_flops(
        lambda iv, img: slide_inference(lambda p: model.apply(iv, p), img,
                                        (1024, 1024), (768, 768)),
        ivars, big)["flops"]
    jinfer(ivars, big)[0].item()  # warm
    t0 = time.perf_counter()
    float(jinfer(ivars, big)[-1])
    dt = (time.perf_counter() - t0) / INFER_ITERS
    fps = 1.0 / dt
    # the V100 reference number is per 512^2 ADE image; this canvas is
    # 1024x2048 = 8x those pixels, so normalize for vs_baseline
    eq512 = fps * 8.0
    print(json.dumps({
        "metric": "cascade_mit_b0_slide1024_inference",
        "value": round(fps, 2),
        "unit": "images/sec/chip (1024x2048 canvas)",
        "ms_per_image": round(dt * 1e3, 1),
        "equiv_512sq_images_per_sec": round(eq512, 1),
        "mfu": round(mfu_of(iflops, dt), 4),
        "gflops_per_image": round(iflops / 1e9, 1),
        "vs_baseline": round(eq512 / REF_V100_SEG_FPS, 3),
    }))


if __name__ == "__main__":
    main()
