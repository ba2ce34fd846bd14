"""Segmentation stack: losses vs oracles, metrics, slide inference,
pipelines, app smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_intersect_and_union_matches_numpy():
    from fudanocr_tpu.eval.seg_metrics import intersect_and_union, total_metrics

    rng = np.random.default_rng(0)
    pred = rng.integers(0, 3, (2, 16, 16))
    label = rng.integers(0, 3, (2, 16, 16))
    label[0, :2] = 255  # ignore
    i, u, pa, la = intersect_and_union(jnp.asarray(pred), jnp.asarray(label),
                                       3)
    valid = label != 255
    for c in range(3):
        want_i = np.sum((pred == c) & (label == c) & valid)
        want_u = np.sum(((pred == c) | (label == c)) & valid)
        assert int(i[c]) == want_i and int(u[c]) == want_u

    res = total_metrics(np.asarray(i, np.float64), np.asarray(u, np.float64),
                        np.asarray(pa, np.float64), np.asarray(la, np.float64))
    assert 0 <= res["mIoU"] <= 1 and 0 <= res["aAcc"] <= 1


def test_seg_losses_basic_properties():
    from fudanocr_tpu.losses.seg_losses import (cross_entropy_loss, dice_loss,
                                                focal_loss, tversky_loss,
                                                lovasz_softmax_loss,
                                                seg_accuracy)

    labels = jnp.asarray(np.random.default_rng(1).integers(0, 2, (2, 8, 8)))
    good = jax.nn.one_hot(labels, 2) * 10.0
    bad = jax.nn.one_hot(1 - labels, 2) * 10.0
    for fn in (cross_entropy_loss, dice_loss, focal_loss, tversky_loss,
               lovasz_softmax_loss):
        lg, lb = float(fn(good, labels)), float(fn(bad, labels))
        assert lg < lb, fn.__name__
    assert float(seg_accuracy(good, labels)) == 1.0

    # ignore_index: fully-ignored map yields finite loss
    ign = jnp.full((1, 4, 4), 255)
    assert np.isfinite(float(cross_entropy_loss(good[:1, :4, :4], ign)))


def test_slide_inference_equals_whole_on_single_crop():
    from fudanocr_tpu.models.seg.encoder_decoder import slide_inference

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)

    def apply_fn(patch):
        return patch[..., :2] * 3.0  # deterministic pseudo-logits

    whole = apply_fn(img)
    slid = slide_inference(apply_fn, img, (16, 16), (8, 8))
    np.testing.assert_allclose(np.asarray(slid), np.asarray(whole),
                               rtol=1e-6)
    # overlapping crops of a translation-invariant fn also average cleanly
    slid2 = slide_inference(apply_fn, img, (8, 8), (4, 4))
    np.testing.assert_allclose(np.asarray(slid2), np.asarray(whole),
                               rtol=1e-6)


def test_pipeline_label_remap_and_pad():
    from fudanocr_tpu.data.seg_pipeline import (LoadAnnotations, Pad,
                                                TEXTSEG_MAPPING)

    seg = np.asarray([[0, 100], [255, 0]], np.uint8)
    out = LoadAnnotations(TEXTSEG_MAPPING)({"img": np.zeros((2, 2, 3),
                                                            np.uint8),
                                            "gt_seg": seg})
    np.testing.assert_array_equal(out["gt_seg"], [[0, 1], [255, 0]])

    padded = Pad((4, 4))(out)
    assert padded["img"].shape == (4, 4, 3)
    assert padded["gt_seg"].shape == (4, 4)
    assert padded["gt_seg"][3, 3] == 255  # pad with ignore


def test_cascade_mit_pyramid_shapes():
    from fudanocr_tpu.models.seg import CascadeMiT

    m = CascadeMiT(embed_dims=8, num_layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 40), (1, 2, 2, 64)]


def test_seg_app_smoke():
    import tempfile
    from fudanocr_tpu.apps.seg.train import main

    with tempfile.TemporaryDirectory() as tmp:
        main(["configs/seg/textformer_b0_textseg.yaml",
              "--options", "schedule.total_iters=2",
              "schedule.eval_every=1000000", "data.batch_size=2",
              "data.synthetic_samples=4",
              "model.backbone.num_layers=[1,1,1,1]", f"ckpt_dir={tmp}"])
