"""Profile the det-guided 1024^2 train step on the chip and print the
per-op time breakdown (top kernels by total device time).

Usage: python scripts/profile_det.py [outdir]
Parses the perfetto trace (vm.trace.json.gz) jax.profiler writes — the
axon tunnel supports start/stop_trace but not pure_callback.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from trace_util import device_summary, load_trace  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/det_trace"

    from fudanocr_tpu.models.seg import (CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         SegformerHead)
    from fudanocr_tpu.train.seg import make_seg_optimizer, make_seg_train_step
    from fudanocr_tpu.train.state import TrainState
    from fudanocr_tpu.core.mesh import make_mesh_for_batch

    det_model = DetGuidedEncoderDecoder(
        backbone=CascadeMiTDetGuided(embed_dims=32, num_layers=(2, 2, 2, 2),
                                     dtype=jnp.bfloat16),
        decode_head=SegformerHead(num_classes=2, channels=256,
                                  dtype=jnp.bfloat16))
    import os
    B = int(os.environ.get("DET_PROFILE_BATCH", "1"))
    img = jax.random.uniform(jax.random.PRNGKey(4), (B, 1024, 1024, 3))
    gt = jnp.zeros((B, 1024, 1024), jnp.int32)
    det = jnp.zeros((B, 1024, 1024), jnp.int32)
    variables = jax.jit(det_model.init, static_argnames=("train",))(
        jax.random.PRNGKey(5), img, train=True)
    mesh = make_mesh_for_batch(B)
    tx = make_seg_optimizer(variables["params"])
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    raw = make_seg_train_step(det_model, mesh, {"ce": 1.0, "lovasz": 1.0},
                              det_loss_ratio=0.1, wrap_jit=False)
    batch = {"img": img, "gt_seg": gt, "gt_det": det}

    def chain(state, batch, rng):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, m = raw(st, batch, sub)
            return (st, r), m["loss"]
        (st, _), losses = jax.lax.scan(body, (state, rng), None, length=2)
        return st, losses

    compiled = jax.jit(chain).lower(state, batch,
                                    jax.random.PRNGKey(6)).compile()
    st, losses = compiled(state, batch, jax.random.PRNGKey(6))
    print("warm loss", float(losses[-1]), flush=True)

    jax.profiler.start_trace(outdir)
    st2, losses = compiled(state, batch, jax.random.PRNGKey(6))
    print("profiled loss", float(losses[-1]), flush=True)
    jax.profiler.stop_trace()

    device_summary(load_trace(outdir))


if __name__ == "__main__":
    main()
