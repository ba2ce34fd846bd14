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
    mask = region_attn_mask(region, (2, 2), 1)  # (1,1,4,4) keep-mask
    m = np.asarray(mask[0, 0])
    # same-region pairs masked out (False), cross-region kept (True)
    assert not m[0, 1] and not m[2, 3]   # same regions
    assert m[0, 2] and m[1, 3]           # different regions


def test_det_guided_backbone_shapes():
    from fudanocr_tpu.models.seg import (CascadeMiTDetGuided,
                                         DetGuidedEncoderDecoder,
                                         SegformerHead)

    m = CascadeMiTDetGuided(embed_dims=8, num_layers=(1, 1, 1, 1))
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
