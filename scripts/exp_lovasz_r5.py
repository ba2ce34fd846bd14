"""On-chip A/B: sort vs bucketed Lovász inside the real seg train steps.

The round-4 det-guided profile put the Lovász bitonic sorts at ~12% of
the 1024^2 batch-8 step (commit c42ec20) — both losses run on FULL-
resolution upsampled logits (train/seg.py loss_of), so at 1024^2 B=8 the
two 2-operand sorts process 8.4M elements each. The bucketed rewrite
(losses/seg_losses.py::lovasz_softmax_bucketed) replaces them with K-bin
histogram compare-reduces; this script times the COMPLETE train step
(plain 512^2 B=2 and det-guided 1024^2 B=8) for impl in {sort,
bucketed@K} to decide the default.

Usage: python scripts/exp_lovasz_r5.py
Prints one JSON line per (step, impl, K).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_util import analytic_flops, mfu as mfu_of, require_device  # noqa: E402

ITERS = 4


def time_step(tag, model, img_hw, batch, variant_steps):
    from fudanocr_tpu.core.mesh import make_mesh_for_batch
    from fudanocr_tpu.train.seg import make_seg_optimizer
    from fudanocr_tpu.train.state import TrainState

    h, w = img_hw
    img = jax.random.uniform(jax.random.PRNGKey(0), (batch, h, w, 3),
                             jnp.float32)
    gt = (jax.random.uniform(jax.random.PRNGKey(7), (batch, h, w))
          > 0.7).astype(jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), img, train=True)
    tx = make_seg_optimizer(variables["params"])
    base_state = TrainState.create(variables["params"],
                                   variables.get("batch_stats", {}), tx)
    batch_d = {"img": img, "gt_seg": gt}
    if "det" in tag:
        batch_d["gt_det"] = gt

    for name, raw_step in variant_steps(model):
        def chain(state, b, rng):
            def body(carry, _):
                st, r = carry
                r, sub = jax.random.split(r)
                st, m = raw_step(st, b, sub)
                return (st, r), m["loss"]
            (st, _), losses = jax.lax.scan(body, (state, rng), None,
                                           length=ITERS)
            return st, losses

        compiled = jax.jit(chain).lower(
            base_state, batch_d, jax.random.PRNGKey(2)).compile()
        flops = analytic_flops(raw_step, base_state, batch_d,
                               jax.random.PRNGKey(9))["flops"]
        st, losses = compiled(base_state, batch_d, jax.random.PRNGKey(2))
        float(losses[-1])
        t0 = time.perf_counter()
        st, losses = compiled(base_state, batch_d, jax.random.PRNGKey(2))
        loss_val = float(losses[-1])
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({
            "step": tag, "impl": name,
            "img_s": round(batch / dt, 2),
            "ms_per_step": round(dt * 1e3, 1),
            "mfu": round(mfu_of(flops, dt), 4),
            "loss_iter%d" % ITERS: round(loss_val, 5),
        }), flush=True)


def main():
    require_device()
    from fudanocr_tpu.models.seg import (CascadeMiT, CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         EncoderDecoder, SegformerHead)
    from fudanocr_tpu.core.mesh import make_mesh_for_batch
    from fudanocr_tpu.train.seg import make_seg_train_step

    def variants(batch):
        mesh = make_mesh_for_batch(batch)

        def make(model):
            out = []
            for name, impl, k in (("sort", "sort", 0),
                                  ("bucketed_k1024", "bucketed", 1024),
                                  ("bucketed_k4096", "bucketed", 4096)):
                if k:
                    import fudanocr_tpu.losses.seg_losses as sl
                    import fudanocr_tpu.train.seg as ts

                    bucketed = functools.partial(sl.lovasz_softmax_bucketed,
                                                 num_buckets=k)
                    orig = sl.lovasz_softmax_bucketed
                    # bind K through the module the trainer imports from
                    ts.lovasz_softmax_bucketed = bucketed
                    step = make_seg_train_step(
                        model, mesh, {"ce": 1.0, "lovasz": 1.0},
                        det_loss_ratio=0.1, wrap_jit=False,
                        lovasz_impl=impl)
                    ts.lovasz_softmax_bucketed = orig
                else:
                    step = make_seg_train_step(
                        model, mesh, {"ce": 1.0, "lovasz": 1.0},
                        det_loss_ratio=0.1, wrap_jit=False,
                        lovasz_impl=impl)
                out.append((name, step))
            return out

        return make

    plain = EncoderDecoder(
        backbone=CascadeMiT(embed_dims=32, num_layers=(2, 2, 2, 2),
                            dtype=jnp.bfloat16),
        decode_head=SegformerHead(num_classes=2, channels=256,
                                  dtype=jnp.bfloat16))
    time_step("plain_512_b2", plain, (512, 512), 2, variants(2))

    det = DetGuidedEncoderDecoder(
        backbone=CascadeMiTDetGuided(embed_dims=32, num_layers=(2, 2, 2, 2),
                                     dtype=jnp.bfloat16),
        decode_head=SegformerHead(num_classes=2, channels=256,
                                  dtype=jnp.bfloat16))
    time_step("det_1024_b8", det, (1024, 1024), 8, variants(8))


if __name__ == "__main__":
    main()
