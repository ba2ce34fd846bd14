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


def test_sr_smoke_train_loss_decreases():
    assert len(jax.devices()) == 8  # virtual CPU mesh
    model = TBSRN(scale_factor=2, width=64, height=16, stn=False,
                  srb_nums=1, hidden_units=8)
    data = SyntheticTextZoom(num_samples=64, hr_size=(64, 16), scale=2)
    loss_fn = TextFocusLoss(None, None, text_focus=False)  # plain MSE

    with tempfile.TemporaryDirectory() as tmp:
        trainer = SRTrainer(model, loss_fn, data, data, batch_size=16,
                            lr=1e-3, epochs=3, eval_every=10**9,
                            ckpt_dir=tmp, mesh=make_mesh())
        losses = []
        for epoch in range(3):
            for hr, lr, labels in trainer._batches(data):
                batch = trainer._device_batch(hr, lr, labels)
                trainer.rng, rng = jax.random.split(trainer.rng)
                trainer.state, m = trainer.train_step(trainer.state, batch, rng)
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

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


def test_sr_trainer_hr_map_cache_reused_across_epochs():
    """With a text-focus loss the trainer computes each batch's HR map
    once (epoch 0) and serves later epochs from host RAM."""
    from fudanocr_tpu.losses.sr_losses import encode_text_labels  # noqa: F401
    from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer

    model = TBSRN(scale_factor=2, width=64, height=16, stn=False,
                  srb_nums=1, hidden_units=8)
    data = SyntheticTextZoom(num_samples=32, hr_size=(64, 16), scale=2)
    oracle = OCRTransformer(vocab=37, num_in=1, layers=(1, 1, 1, 1),
                            num_heads=4, d_embed=32, d_model=64, d_ff=64)
    ovars = oracle.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 64, 1)),
                        jnp.zeros((2, 4), jnp.int32))
    loss_fn = TextFocusLoss(oracle, ovars, text_focus=True)
    trainer = SRTrainer(model, loss_fn, data, data, batch_size=16,
                        lr=1e-3, epochs=2, eval_every=10 ** 9,
                        mesh=make_mesh())
    assert trainer._use_hr_cache
    trainer.train()
    assert len(trainer._hr_map_cache) == 2  # 32 samples / batch 16
    assert trainer._hr_cache_bytes > 0
