"""CCR-CLIP pretraining benchmark: stage-1 contrastive step + gallery encode.

The reference hot loop (image-ids-CTR/CCR-CLIP/main.py:82-116) trains a
CLIP dual tower (RN50 visual + 12-layer w=512 text transformer, embed
2048) on batches of 128 char images @128x128 with 30-token radical
sequences: symmetric CE on logit_scale * img @ txt.T with
first-occurrence targets, Adam(1e-4, (0.9, 0.98)). Its eval encodes the
3755-char gallery's text features in chunks of 100 (main.py:33-78).

Two numbers at that recipe:

  * contrastive train step — images/sec/chip + MFU;
  * zero-shot gallery encode (3755 IDS sequences, chunk 100 as the
    reference batches it) — chars/sec.

Iterations are chained inside one jit (axon tunnel dispatch ~1.4 s/call
dwarfs the device step; see bench.py). Prints one JSON line per metric.
"""

import json
import time

import jax
import jax.numpy as jnp

from bench_util import analytic_flops, mfu as mfu_of, require_device, xla_flops

BATCH = 128
TRAIN_ITERS = 8
GALLERY_ITERS = 4
MAX_LEN = 30
VOCAB = 2504          # len(radical_alphabet_27533_benchmark) + 3 specials
GALLERY = 3755
CHUNK = 100

# Reference V100 estimates, anchored by a measured CPU run of the
# reference's own torch code (scripts/measure_ref_clip_cpu.py) scaled
# through the shared FLOP model — full chain in BASELINE.md
# "REF_GPU_CLIP_* derivation".
REF_GPU_CLIP_TRAIN_IPS = 128
REF_GPU_CLIP_GALLERY_CPS = 7600


def main():
    require_device()
    import optax

    from fudanocr_tpu.losses.clip_loss import clip_symmetric_ce
    from fudanocr_tpu.models.rec.ccr_clip import CCRCLIP
    from fudanocr_tpu.train.state import TrainState

    model = CCRCLIP(vocab_size=VOCAB, context_length=MAX_LEN,
                    dtype=jnp.bfloat16)
    img = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 128, 128, 3))
    text = jax.random.randint(jax.random.PRNGKey(1), (BATCH, MAX_LEN),
                              1, VOCAB - 1)
    text = text.at[:, 10].set(VOCAB - 1)  # EOT = max id (utils.py:16-17)
    targets = jnp.arange(BATCH, dtype=jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(2), img, text, train=True)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.adam(1e-4, b1=0.9, b2=0.98, eps=1e-6))

    def raw_step(state, img, text, targets):
        def loss_of(params):
            (img_f, txt_f, scale), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, text, train=True, mutable=["batch_stats"])
            return clip_symmetric_ce(img_f, txt_f, scale, targets), \
                mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    def chain(state, img, text, targets):
        def body(st, _):
            st, loss = raw_step(st, img, text, targets)
            return st, loss
        return jax.lax.scan(body, state, None, length=TRAIN_ITERS)

    compiled = jax.jit(chain, donate_argnums=(0,)).lower(
        state, img, text, targets).compile()
    step_flops = analytic_flops(raw_step, state, img, text, targets)["flops"]
    state, losses = compiled(state, img, text, targets)
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = compiled(state, img, text, targets)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / TRAIN_ITERS
    print(json.dumps({
        "metric": "ccr_clip_pretrain_step",
        "value": round(BATCH / dt, 1),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1e3, 1),
        "mfu": round(mfu_of(step_flops, dt), 4),
        "gflops_per_step": round(step_flops / 1e9, 1),
        "xla_flops_scan_body": xla_flops(compiled),
        "vs_baseline": round(BATCH / dt / REF_GPU_CLIP_TRAIN_IPS, 2),
    }), flush=True)

    # ---- zero-shot gallery encode: 3755 IDS sequences, chunks of 100
    # (main.py:44-55; the chunking IS the reference protocol, kept to
    # compare like against like — one fused 3755 batch would be faster) ----
    ivars = {"params": state.params, "batch_stats": state.batch_stats}
    pad = (GALLERY + CHUNK - 1) // CHUNK * CHUNK
    gtok = jax.random.randint(jax.random.PRNGKey(3), (pad, MAX_LEN),
                              1, VOCAB - 1)
    gtok = gtok.at[:, 10].set(VOCAB - 1)
    chunks = gtok.reshape(pad // CHUNK, CHUNK, MAX_LEN)

    def gallery_chain(ivars, chunks):
        def encode_all(chunks):
            return jax.lax.map(
                lambda t: model.apply(ivars, t,
                                      method=model.encode_text), chunks)

        def body(x, _):
            f = encode_all(x)
            # data dependency between iterations defeats CSE
            return x + (1e-12 * f.sum()).astype(x.dtype), f[0, 0, 0]
        _, outs = jax.lax.scan(body, chunks, None, length=GALLERY_ITERS)
        return outs

    jgal = jax.jit(gallery_chain).lower(ivars, chunks).compile()
    float(jgal(ivars, chunks)[-1])
    t0 = time.perf_counter()
    float(jgal(ivars, chunks)[-1])
    dt = (time.perf_counter() - t0) / GALLERY_ITERS
    print(json.dumps({
        "metric": "ccr_clip_gallery3755_encode",
        "value": round(GALLERY / dt, 1),
        "unit": "chars/sec/chip",
        "ms_per_gallery": round(dt * 1e3, 1),
        "vs_baseline": round(GALLERY / dt / REF_GPU_CLIP_GALLERY_CPS, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
