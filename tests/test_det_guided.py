"""Det-guided (V10) backbone: shapes, instance labeling, region masks."""

import numpy as np
import jax
import jax.numpy as jnp


def test_instance_labels_separates_components():
    from fudanocr_tpu.models.seg.det_guided import _instance_labels_host

    binary = np.zeros((1, 16, 16), np.int32)
    binary[0, 2:5, 2:5] = 1    # component A
    binary[0, 10:13, 10:14] = 1  # component B
    out = _instance_labels_host(binary)
    ids = set(np.unique(out[0])) - {0.0}
    assert len(ids) == 2
    # each component uniform
    assert len(np.unique(out[0, 2:5, 2:5])) == 1
    assert len(np.unique(out[0, 10:13, 10:14])) == 1


def test_region_attn_mask_semantics():
    from fudanocr_tpu.models.seg.det_guided import region_attn_mask

    region = jnp.asarray(np.array([[[0, 0], [1, 1]]], np.float32))
    mask = region_attn_mask(region, (2, 2), 1)  # (1,1,4,4) additive mask
    m = np.asarray(mask[0, 0])
    # same-region pairs get -1e10 added, cross-region pairs 0
    # (calculate_mask, cascade_mit.py:4890-4896)
    assert m[0, 1] == -1e10 and m[2, 3] == -1e10   # same regions
    assert m[0, 2] == 0 and m[1, 3] == 0           # different regions


def test_nearest_resize_matches_torch_semantics():
    """floor(dst*in/out) indexing, not jax's half-pixel centers."""
    from fudanocr_tpu.models.seg.det_guided import nearest_resize_torch

    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 4)
    out = np.asarray(nearest_resize_torch(x, (1, 2)))
    # torch F.interpolate nearest picks src floor(i*4/2) = {0, 2}, row 0
    np.testing.assert_array_equal(out, [[[0.0, 2.0]]])


def test_det_guided_train_step_uses_loaded_gt_masks():
    """End-to-end: det-guided trainer with gt_det coming from the LOADED
    dataset annotations (not synthesized from seg gt), both as det-loss
    target (decode_head.py:244-256) and, with gt_guided_masks, threaded
    into the backbone's attention-mask construction
    (encoder_decoder.py:337 V4 semantics)."""
    from fudanocr_tpu.data.seg_dataset import SyntheticTextSeg
    from fudanocr_tpu.data.seg_pipeline import Normalize
    from fudanocr_tpu.models.seg import (CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         SegformerHead)
    from fudanocr_tpu.train.seg import SegTrainer

    from fudanocr_tpu.core.mesh import make_mesh_for_batch

    data = SyntheticTextSeg(num_samples=4, size=(32, 32),
                            pipeline=[Normalize()], with_det=True)
    assert "gt_det" in data[0]
    # instance_impl='host' + a 1-device mesh: the assertions here are about
    # gt_det WIRING (dataset -> det loss -> attention masks), not the CCL;
    # the device CCL and its mesh-sharded dispatch have dedicated tests
    # below, and skipping its while_loop in this grad program cuts the
    # test's dominant compile cost (suite-time item, VERDICT r4 #8).
    model = DetGuidedEncoderDecoder(
        backbone=CascadeMiTDetGuided(embed_dims=8, num_layers=(1, 1, 1, 1),
                                     drop_path_rate=0.0,
                                     instance_impl="host"),
        decode_head=SegformerHead(num_classes=2, channels=16))
    trainer = SegTrainer(model, data, data, batch_size=2, total_iters=1,
                         eval_every=10 ** 9, gt_guided_masks=True,
                         mesh=make_mesh_for_batch(2, jax.devices()[:1]))
    state = trainer.train()
    batch = next(data.batches(2))
    _, metrics = trainer.train_step(
        state, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "det" in metrics and np.isfinite(float(metrics["det"]))


def test_det_guided_backbone_shapes():
    from fudanocr_tpu.models.seg import (CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         SegformerHead)

    # host CCL: this test asserts SHAPES; the device CCL's compile
    # (the expensive part on the CPU host) has its own dedicated tests
    m = CascadeMiTDetGuided(embed_dims=8, num_layers=(1, 1, 1, 1),
                            instance_impl="host")
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    outs, det = m.apply(vs, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 40), (1, 2, 2, 64)]
    assert det.shape == (1, 16, 16, 2)

    seg = DetGuidedEncoderDecoder(
        backbone=m, decode_head=SegformerHead(num_classes=2, channels=16))
    vs2 = seg.init(jax.random.PRNGKey(1), x)
    logits, det2 = seg.apply(vs2, x)
    assert logits.shape == (1, 64, 64, 2) and det2.shape == (1, 16, 16, 2)


def test_device_instance_labels_match_cv2_partition():
    """The XLA fallback (for backends without host callbacks, e.g. the
    axon TPU tunnel) must induce the same component PARTITION as the cv2
    path on hole-free regions — masks only use label equality."""
    from fudanocr_tpu.models.seg.det_guided import (_instance_labels_host,
                                                    instance_labels_device)

    rng = np.random.default_rng(3)
    binary = np.zeros((2, 24, 24), np.int32)
    binary[0, 2:6, 3:9] = 1
    binary[0, 10:15, 12:20] = 1
    binary[0, 20:22, 0:4] = 1
    binary[1, 5:9, 5:9] = 1
    want = _instance_labels_host(binary)
    got = np.asarray(instance_labels_device(jnp.asarray(binary, jnp.float32)))
    # same partition: the pairwise-equality matrices agree
    for b in range(2):
        w = want[b].reshape(-1)
        g = got[b].reshape(-1)
        np.testing.assert_array_equal(
            (w[:, None] == w[None, :]), (g[:, None] == g[None, :]))
    assert (got[binary == 0] == 0).all()


def test_device_instance_labels_adversarial_shapes():
    """The hook+pointer-jump CCL must fully converge in its default
    ~log2(H*W) rounds on shapes where plain neighbour-min propagation
    needs O(path length) rounds: serpentines and spirals. Oracle is
    scipy's 4-connected labeling (cv2's contour FILL paints over spiral
    gaps, so it is not a valid oracle here — masks use 4-connectivity)."""
    from scipy import ndimage

    from fudanocr_tpu.models.seg.det_guided import instance_labels_device

    rng = np.random.default_rng(0)
    cases = []
    cases.append((rng.random((2, 48, 48)) > 0.4).astype(np.int32))
    serp = np.zeros((1, 64, 64), np.int32)
    for r in range(0, 64, 4):
        serp[0, r, :] = 1
        if (r // 4) % 2 == 0 and r + 4 < 64:
            serp[0, r:r + 4, 63] = 1
        elif r + 4 < 64:
            serp[0, r:r + 4, 0] = 1
    cases.append(serp)
    spiral = np.zeros((1, 65, 65), np.int32)
    x0, x1, y0, y1 = 0, 64, 0, 64
    while x0 < x1:
        spiral[0, y0, x0:x1 + 1] = 1
        spiral[0, y0:y1 + 1, x1] = 1
        spiral[0, y1, x0:x1 + 1] = 1
        spiral[0, y0 + 2:y1 + 1, x0] = 1
        x0 += 2; y0 += 2; x1 -= 2; y1 -= 2
    cases.append(spiral)

    for binary in cases:
        got = np.asarray(
            instance_labels_device(jnp.asarray(binary, jnp.float32)))
        for b in range(binary.shape[0]):
            want, _ = ndimage.label(binary[b])  # 4-connectivity default
            w = want.reshape(-1)
            g = got[b].reshape(-1)
            np.testing.assert_array_equal(
                (w[:, None] == w[None, :]), (g[:, None] == g[None, :]))
        assert (got[binary == 0] == 0).all()


def test_instance_labels_mesh_aware_dispatch_and_sharded_agreement():
    """Under a multi-device mesh the auto dispatch must take the device
    CCL (the cv2 callback would gather the whole tensor to device 0 —
    the round-3 SPMD rematerialization warnings), and the sharded device
    result must induce the same partition as the host-cv2 oracle."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fudanocr_tpu.models.seg.det_guided import (_instance_labels_host,
                                                    instance_labels)

    assert len(jax.devices()) == 8  # conftest forces the virtual mesh

    binary = np.zeros((8, 24, 24), np.int32)
    rng = np.random.default_rng(11)
    for b in range(8):
        for _ in range(3):
            y, x = rng.integers(0, 16, 2)
            binary[b, y:y + rng.integers(2, 8), x:x + rng.integers(2, 8)] = 1

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.asarray(binary, jnp.float32), sh)
    got = np.asarray(jax.jit(instance_labels)(x))  # auto => device path

    want = _instance_labels_host(binary)
    for b in range(8):
        w = want[b].reshape(-1)
        g = got[b].reshape(-1)
        np.testing.assert_array_equal(
            (w[:, None] == w[None, :]), (g[:, None] == g[None, :]))
    assert (got[binary == 0] == 0).all()

    # explicit impl='host' still runs the cv2 callback (the single-device
    # parity oracle), byte-identical to calling the host fn directly
    host = np.asarray(jax.jit(
        lambda t: instance_labels(t, impl="host"))(jnp.asarray(
            binary, jnp.float32)))
    np.testing.assert_array_equal(host, want)
