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
