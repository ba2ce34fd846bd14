"""GAN SR trainer smoke + SR resume roundtrip."""

import tempfile

import jax
import numpy as np


def test_gan_trainer_smoke():
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom
    from fudanocr_tpu.models.sr import RRDBNet, SRDiscriminator
    from fudanocr_tpu.train.gan import GANSRTrainer

    data = SyntheticTextZoom(num_samples=8, hr_size=(32, 16), scale=2)
    trainer = GANSRTrainer(RRDBNet(scale_factor=2, nf=8, nb=1, gc=4),
                           SRDiscriminator(), data, batch_size=4, epochs=1)
    metrics = trainer.train()
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["pix"])


def test_sr_trainer_resume_roundtrip():
    from fudanocr_tpu.core import checkpoint as ckpt_lib
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom
    from fudanocr_tpu.losses.sr_losses import TextFocusLoss
    from fudanocr_tpu.models.sr import SRCNN
    from fudanocr_tpu.train.sr import SRTrainer

    data = SyntheticTextZoom(num_samples=8, hr_size=(32, 16), scale=2)
    loss = TextFocusLoss(None, None, text_focus=False)
    with tempfile.TemporaryDirectory() as tmp:
        t1 = SRTrainer(SRCNN(scale_factor=2), loss, data, data,
                       batch_size=4, epochs=1, eval_every=10**9)
        ckpt_lib.save(f"{tmp}/ck", {"params": t1.state.params,
                                    "batch_stats": t1.state.batch_stats},
                      meta={"step": 7})
        t2 = SRTrainer(SRCNN(scale_factor=2), loss, data, data,
                       batch_size=4, epochs=1, eval_every=10**9, seed=99)
        before = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(t2.state.params)]
        t2.resume(f"{tmp}/ck")
        after = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(t2.state.params)]
        want = [np.asarray(x) for x in
                jax.tree_util.tree_leaves(t1.state.params)]
        # different seeds -> at least one param differs before resume
        assert any(not np.allclose(b, w) for b, w in zip(before, want))
        for a, w in zip(after, want):
            np.testing.assert_array_equal(a, w)
