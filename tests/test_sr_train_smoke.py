"""End-to-end tiny SR training on synthetic data over the 8-device CPU mesh:
loss decreases, eval produces PSNR/SSIM, checkpoints round-trip."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.core import checkpoint as ckpt_lib
from fudanocr_tpu.core.mesh import make_mesh
from fudanocr_tpu.data.synthetic import SyntheticTextZoom
from fudanocr_tpu.losses.sr_losses import TextFocusLoss
from fudanocr_tpu.models.sr import TBSRN
from fudanocr_tpu.train.sr import SRTrainer


def test_sr_smoke_train_loss_decreases_and_hr_cache_reused():
    """One trainer compile covers the end-to-end smoke (loss decreases,
    eval metrics, checkpoint round-trip) AND the per-sample HR-oracle
    cache behavior. The plain-MSE (no text_focus) trainer path is
    exercised by tests/test_apps_sr.py's CLI smoke."""
    assert len(jax.devices()) == 8  # virtual CPU mesh
    from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer

    model = TBSRN(scale_factor=2, width=64, height=16, stn=False,
                  srb_nums=1, hidden_units=8)
    data = SyntheticTextZoom(num_samples=32, hr_size=(64, 16), scale=2)
    oracle = OCRTransformer(vocab=37, num_in=1, layers=(1, 1, 1, 1),
                            num_heads=4, d_embed=32, d_model=64, d_ff=64)
    ovars = oracle.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 64, 1)),
                        jnp.zeros((2, 4), jnp.int32))
    loss_fn = TextFocusLoss(oracle, ovars, text_focus=True)

    with tempfile.TemporaryDirectory() as tmp:
        trainer = SRTrainer(model, loss_fn, data, data, batch_size=16,
                            lr=1e-3, epochs=3, eval_every=10**9,
                            ckpt_dir=tmp, mesh=make_mesh())
        assert trainer._use_hr_cache
        losses = []
        for epoch in range(3):
            for bi, (hr, lr, labels) in enumerate(trainer._batches(data)):
                batch = trainer._device_batch(hr, lr, labels)
                batch["hr_map"] = trainer._hr_map(bi, batch)  # as train()
                trainer.rng, rng = jax.random.split(trainer.rng)
                trainer.state, m = trainer.train_step(trainer.state, batch, rng)
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
        # epoch 0 computed each batch's HR map once; epochs 1-2 hit the cache
        assert len(trainer._hr_map_cache) == 2  # 32 samples / batch 16
        assert trainer._hr_cache_bytes > 0

        res = trainer.evaluate(1)
        assert res["psnr"] > 5.0 and 0.0 < res["ssim"] <= 1.0

        # checkpoint round-trip
        tree = {"params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats}
        ckpt_lib.save(f"{tmp}/ck", tree, meta={"step": 1})
        loaded = ckpt_lib.load(f"{tmp}/ck", tree)
        a = jax.tree_util.tree_leaves(tree)[0]
        b = jax.tree_util.tree_leaves(loaded)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_text_focus_cached_oracle_map_matches_live():
    """TextFocusLoss with a precomputed hr_map must produce the SAME loss
    (and thus gradients) as the live HR oracle forward — the correctness
    contract behind SRTrainer's per-sample oracle cache."""
    from fudanocr_tpu.losses.sr_losses import encode_text_labels
    from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer

    b, h, w = 2, 32, 64
    oracle = OCRTransformer(vocab=37, num_in=1, layers=(1, 1, 1, 1),
                            num_heads=4, d_embed=32, d_model=64, d_ff=64)
    ti, tg, ln = encode_text_labels(["ab", "cde"], 8)
    ovars = oracle.init(jax.random.PRNGKey(0), jnp.zeros((b, h, w, 1)),
                        jnp.asarray(ti))
    loss_fn = TextFocusLoss(oracle, ovars, text_focus=True)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
    sr = jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3))
    args = (sr, hr, jnp.asarray(ti), jnp.asarray(tg), jnp.asarray(ln))
    live, aux_live = loss_fn(*args)
    hr_map = loss_fn.hr_oracle_map(hr, jnp.asarray(ti))
    cached, aux_cached = loss_fn(*args, hr_map=hr_map)
    np.testing.assert_allclose(np.asarray(live), np.asarray(cached),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_live["attention"]),
                               np.asarray(aux_cached["attention"]), rtol=1e-6)


# (the HR-map cache-reuse assertions live in
# test_sr_smoke_train_loss_decreases_and_hr_cache_reused above — one
# trainer compile instead of two)
