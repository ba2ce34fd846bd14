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


def test_seg_loss_fast_paths_match_direct_autodiff():
    """The gather-free CE and the stop-gradient-sorted Lovász must equal the
    straightforward formulations in BOTH value and gradient (the fast paths
    exist because the gather/sort VJPs were the seg train step's hottest
    ops — 22 of 39 ms/step at 512^2)."""
    from fudanocr_tpu.losses.seg_losses import (_lovasz_grad,
                                                cross_entropy_loss,
                                                lovasz_softmax_loss)

    rng = np.random.default_rng(7)

    def ce_direct(lg):
        valid = labels != 255
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        w = valid.astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.sum(w)

    def lovasz_direct(lg):
        c = lg.shape[-1]
        probs = jax.nn.softmax(lg, axis=-1).reshape(-1, c)
        flat = labels.reshape(-1)
        valid = flat != 255
        safe = jnp.where(valid, flat, 0)
        tot, n = 0.0, 0.0
        for ci in range(c):
            fg = ((safe == ci) & valid).astype(jnp.float32)
            errors = jnp.where(valid, jnp.abs(fg - probs[:, ci]), 0.0)
            neg_s, fg_s = jax.lax.sort((-errors, fg), num_keys=1)
            loss_c = jnp.sum(-neg_s * _lovasz_grad(fg_s))
            present = jnp.sum(fg) > 0
            tot = tot + jnp.where(present, loss_c, 0.0)
            n = n + present.astype(jnp.float32)
        return tot / jnp.maximum(n, 1.0)

    # n_classes=2 exercises the shared-error single-sort fast path
    # (every textformer config is binary); 3 exercises the general vmap
    for n_classes in (2, 3):
        logits = jnp.asarray(rng.standard_normal((2, 8, 8, n_classes)),
                             jnp.float32)
        labels = jnp.asarray(rng.integers(0, n_classes, (2, 8, 8)))
        labels = labels.at[0, 0, :3].set(255)  # some ignored pixels
        for fast, direct in ((cross_entropy_loss, ce_direct),
                             (lovasz_softmax_loss, lovasz_direct)):
            v_fast, g_fast = jax.value_and_grad(
                lambda lg: fast(lg, labels))(logits)
            v_dir, g_dir = jax.value_and_grad(direct)(logits)
            np.testing.assert_allclose(float(v_fast), float(v_dir),
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(g_fast),
                                       np.asarray(g_dir),
                                       rtol=1e-4, atol=1e-6)


def test_bucketed_lovasz_tracks_exact_sort_lovasz():
    """The sort-free bucketed Lovász (losses/seg_losses.py) is the exact
    Lovász of the quantized-error ordering with tie-averaged weights;
    with distinct errors it converges to the sort path as num_buckets
    grows. Value must be close and the gradient strongly aligned (the
    surrogate trains the same objective)."""
    from fudanocr_tpu.losses.seg_losses import (lovasz_softmax_bucketed,
                                                lovasz_softmax_loss)

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, (2, 16, 16)))
    labels = labels.at[0, 0, :5].set(255)

    v_e, g_e = jax.value_and_grad(
        lambda lg: lovasz_softmax_loss(lg, labels))(logits)
    for k, vtol in ((1024, 3e-3), (65536, 1e-4)):
        v_b, g_b = jax.value_and_grad(
            lambda lg: lovasz_softmax_bucketed(lg, labels,
                                               num_buckets=k))(logits)
        assert abs(float(v_b) - float(v_e)) < vtol, (k, float(v_b),
                                                     float(v_e))
        ge, gb = np.asarray(g_e).ravel(), np.asarray(g_b).ravel()
        cos = float(ge @ gb / (np.linalg.norm(ge) * np.linalg.norm(gb)))
        assert cos > (0.99 if k == 1024 else 0.9999), (k, cos)
    # degenerate inputs stay finite
    one = jnp.zeros((1, 4, 4, 2), jnp.float32)
    lab0 = jnp.zeros((1, 4, 4), jnp.int32)
    assert np.isfinite(float(lovasz_softmax_bucketed(one, lab0)))
    labi = jnp.full((1, 4, 4), 255, jnp.int32)
    assert np.isfinite(float(lovasz_softmax_bucketed(one, labi)))


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
    # the memory cap (max_fwd_images) splits the 9-crop grid into several
    # forwards without changing the result
    slid3 = slide_inference(apply_fn, img, (8, 8), (4, 4),
                            max_fwd_images=2)
    np.testing.assert_allclose(np.asarray(slid3), np.asarray(slid2),
                               rtol=1e-6)


def test_pipeline_label_remap_and_pad():
    from fudanocr_tpu.data.seg_pipeline import (LoadAnnotations, Pad,
                                                remap_textseg)

    seg = np.asarray([[0, 100], [255, 200]], np.uint8)
    out = LoadAnnotations(remap_textseg)({"img": np.zeros((2, 2, 3),
                                                          np.uint8),
                                          "gt_seg": seg})
    np.testing.assert_array_equal(out["gt_seg"], [[0, 1], [255, 0]])

    padded = Pad((4, 4), seg_pad_val=255)(out)
    assert padded["img"].shape == (4, 4, 3)
    assert padded["gt_seg"].shape == (4, 4)
    assert padded["gt_seg"][3, 3] == 255  # pad with ignore


def test_dataset_remaps_match_reference_rules():
    """Per-dataset value rules from loading.py: textseg 100->1/200->0
    (:221-223), BTS 255->1 (:313), TotalText threshold 127 (:407-408),
    ICDAR13 gray+255->0,>0->1 (:500-507), MLT identity (:595-600)."""
    from fudanocr_tpu.data import seg_pipeline as pp

    np.testing.assert_array_equal(
        pp.remap_textseg(np.asarray([[0, 100, 200, 255, 7]], np.uint8)),
        [[0, 1, 0, 255, 7]])
    np.testing.assert_array_equal(
        pp.remap_bts(np.asarray([[0, 255, 3]], np.uint8)), [[0, 1, 3]])
    np.testing.assert_array_equal(
        pp.remap_totaltext(np.asarray([[0, 127, 128, 255]], np.uint8)),
        [[0, 0, 1, 1]])
    # icdar13: white (255 gray) is BACKGROUND, any other nonzero is text
    rgb = np.zeros((1, 3, 3), np.uint8)
    rgb[0, 0] = (255, 255, 255)   # white -> gray 255 -> 0
    rgb[0, 1] = (30, 30, 30)      # dark gray -> text
    rgb[0, 2] = (0, 0, 0)         # black -> 0
    np.testing.assert_array_equal(pp.remap_icdar13(rgb), [[0, 1, 0]])
    np.testing.assert_array_equal(
        pp.remap_mlt(np.asarray([[0, 9, 255]], np.uint8)), [[0, 9, 255]])


def test_det_annotation_loading_and_geometry(tmp_path):
    """det masks load with the 255->1 rule (loading.py:229-242) and follow
    the image through crop/flip/pad."""
    from PIL import Image
    from fudanocr_tpu.data import seg_pipeline as pp
    from fudanocr_tpu.data.seg_dataset import SegDataset

    for d in ("img", "ann", "det"):
        (tmp_path / d).mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    seg = np.zeros((8, 8), np.uint8)
    seg[2, 2] = 100
    det = np.zeros((8, 8), np.uint8)
    det[:4, :4] = 255
    Image.fromarray(img).save(tmp_path / "img" / "a.jpg")
    Image.fromarray(seg).save(tmp_path / "ann" / "a.png")
    Image.fromarray(det).save(tmp_path / "det" / "a.png")

    ds = SegDataset(str(tmp_path / "img"), str(tmp_path / "ann"),
                    [pp.LoadImageFromFile(),
                     pp.LoadAnnotations(pp.remap_textseg),
                     pp.Pad((16, 16), seg_pad_val=255)],
                    det_dir=str(tmp_path / "det"))
    s = ds[0]
    assert s["gt_det"].shape == (16, 16)
    assert s["gt_det"][:4, :4].max() == 1 and s["gt_det"][0, 7] == 0
    assert s["gt_det"][15, 15] == 255  # padded with ignore
    batch = next(ds.batches(1))
    assert set(batch) >= {"img", "gt_seg", "gt_det", "valid"}


def test_batches_cover_every_sample_with_padding():
    """Eval must not drop the tail (mmseg/apis/test.py covers all images):
    the final partial batch is padded and flagged via `valid`."""
    from fudanocr_tpu.data.seg_dataset import SyntheticTextSeg

    ds = SyntheticTextSeg(num_samples=5, size=(16, 16))
    batches = list(ds.batches(2))
    assert len(batches) == 3
    assert sum(int(b["valid"].sum()) for b in batches) == 5
    assert batches[-1]["valid"].tolist() == [1.0, 0.0]
    assert batches[-1]["img"].shape[0] == 2  # static shape preserved


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
        # crop 64^2 (vs the recipe's 512^2): the assertion is the CLI
        # wiring end-to-end, not the crop size — the 512^2 compile alone
        # was 78 of the suite's ~19 min (VERDICT r4 #8)
        main(["configs/seg/textformer_b0_textseg.yaml",
              "--options", "schedule.total_iters=2",
              "schedule.eval_every=1000000", "data.batch_size=2",
              "data.synthetic_samples=4", "data.crop_size=[64,64]",
              "model.backbone.num_layers=[1,1,1,1]", f"ckpt_dir={tmp}"])


def test_config_family_loads_and_builds():
    """Every textformer preset (b0-b5 x 5 datasets x +-det, mirroring
    configs/textformer/*.py) resolves its _base_ chain and builds a
    model."""
    import glob
    from fudanocr_tpu.apps.seg.train import build_model
    from fudanocr_tpu.core.config import load_config

    presets = sorted(glob.glob("configs/seg/textformer_*.yaml"))
    assert len(presets) == 60
    seen = set()
    for path in presets:
        cfg = load_config(path)
        model = build_model(cfg)
        det = cfg.model.get("det_guided", False)
        assert det == path.endswith("_det.yaml")
        assert cfg.schedule.total_iters == (320_000 if det else 160_000)
        seen.add((cfg.model.backbone.embed_dims,
                  tuple(cfg.model.backbone.num_layers)))
        assert model is not None
    assert (32, (2, 2, 2, 2)) in seen and (64, (3, 6, 40, 3)) in seen


def test_layer_decay_optimizer_scales():
    """Layer-wise lr decay ladder (layer_decay_optimizer_constructor.py:
    162): deeper layers get larger multipliers, head largest."""
    import jax
    from fudanocr_tpu.train.seg import (layer_id_for_param,
                                        make_layer_decay_optimizer)

    nl = (1, 1, 1, 1)
    assert layer_id_for_param("stem_conv/kernel", nl) == 0
    assert layer_id_for_param("layer1_0/conv1/kernel", nl) == 1
    assert layer_id_for_param("layer3_1/bn2/scale", nl) == 3
    assert layer_id_for_param("stage0/layer0/attn/q/kernel", nl) == 3
    assert layer_id_for_param("stage0/patch_embed/kernel", nl) == 3
    s3 = layer_id_for_param("stage3/layer0/ffn/fc1/kernel", nl)
    assert s3 == 3 + 3
    assert layer_id_for_param("fuse4/kernel", nl) == 3 + 4 + 1

    from fudanocr_tpu.models.seg import CascadeMiT
    m = CascadeMiT(embed_dims=8, num_layers=nl)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    tx = make_layer_decay_optimizer(vs["params"], num_layers=nl)
    state = tx.init(vs["params"])  # builds without error over the real tree
    assert state is not None


def test_neck_shapes():
    """FPN/MultiLevel/MLA/JPU/IC necks produce the documented pyramids."""
    from fudanocr_tpu.models.seg.necks import (FPN, ICNeck, JPU, MLANeck,
                                               MultiLevelNeck)

    rng = np.random.default_rng(7)
    pyr = [jnp.asarray(rng.random((1, 16 // (2 ** i), 16 // (2 ** i), c)),
                       jnp.float32) for i, c in enumerate((8, 16, 32))]
    for neck, n_out in ((FPN(out_channels=8), 3),
                        (MultiLevelNeck(out_channels=8, scales=(1, 2, 4)), 3),
                        (JPU(mid_channels=8), 3), (ICNeck(out_channels=8), 3)):
        vs = neck.init(jax.random.PRNGKey(0), pyr, train=False)
        outs = neck.apply(vs, pyr, train=False)
        assert len(outs) == n_out, type(neck).__name__
    # MLA aggregates SAME-resolution ViT outputs (SETR), unlike the others
    same = [jnp.asarray(rng.random((1, 8, 8, c)), jnp.float32)
            for c in (8, 16, 32)]
    mla = MLANeck(out_channels=8)
    vs = mla.init(jax.random.PRNGKey(0), same, train=False)
    outs = mla.apply(vs, same, train=False)
    assert len(outs) == 3 and all(o.shape == (1, 8, 8, 8) for o in outs)
    # JPU: last output = concat of 4 dilated branches at the finest scale
    jpu = JPU(mid_channels=8)
    vs = jpu.init(jax.random.PRNGKey(0), pyr)
    outs = jpu.apply(vs, pyr)
    assert outs[-1].shape == (1, 16, 16, 32)
    # IC: decode output at the finest scale
    ic = ICNeck(out_channels=8)
    vs = ic.init(jax.random.PRNGKey(0), pyr)
    outs = ic.apply(vs, pyr)
    assert outs[2].shape == (1, 16, 16, 8)
