"""CCR-CLIP: tower shapes, contrastive loss behaviour, tiny pretrain step."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.losses.clip_loss import (clip_symmetric_ce,
                                           first_occurrence_targets)
from fudanocr_tpu.models.rec.ccr_clip import CCRCLIP


def test_first_occurrence_targets():
    got = first_occurrence_targets(["a", "b", "a", "c", "b"])
    np.testing.assert_array_equal(got, [0, 1, 0, 3, 1])


def test_clip_towers_and_loss():
    m = CCRCLIP(vocab_size=20, context_length=8, transformer_width=32,
                transformer_heads=4, transformer_layers=2, embed_dim=64)
    # small model override: visual still emits 2048; use embed_dim for text
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.asarray([[1, 2, 19, 0, 0, 0, 0, 0],
                       [3, 4, 5, 19, 0, 0, 0, 0]], jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), img, txt, train=True)
    img_f, txt_f, scale = m.apply(vs, img, txt,
                                  mutable=["batch_stats"])[0]
    assert img_f.shape == (2, 2048)
    # embed_dim mismatch: text projects to 64 — the reference pins both to
    # 2048; here we just check the projection shape knob works
    assert txt_f.shape == (2, 64)
    assert float(scale) > 1.0

    # loss with matching dims
    f1 = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    f1 = f1 / jnp.linalg.norm(f1, axis=1, keepdims=True)
    targets = jnp.asarray([0, 1, 2, 3])
    loss_same = clip_symmetric_ce(f1, f1, 100.0, targets)
    perm = f1[jnp.asarray([1, 0, 3, 2])]
    loss_perm = clip_symmetric_ce(f1, perm, 100.0, targets)
    assert float(loss_same) < float(loss_perm)


def test_eot_pooling_uses_terminator_position():
    m = CCRCLIP(vocab_size=10, context_length=6, transformer_width=16,
                transformer_heads=2, transformer_layers=1, embed_dim=8)
    t1 = jnp.asarray([[1, 2, 9, 0, 0, 0]], jnp.int32)   # '$'=9 at pos 2
    t2 = jnp.asarray([[1, 2, 9, 3, 3, 3]], jnp.int32)   # junk after EOT
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), t1)
    f1 = m.apply(vs, t1, method=m.encode_text)
    f2 = m.apply(vs, t2, method=m.encode_text)
    # causal mask + EOT pooling at '$': tokens after '$' cannot change it
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5,
                               atol=1e-5)


def test_vit_tower_shape():
    from fudanocr_tpu.models.rec.ccr_clip import VisionTransformer

    vit = VisionTransformer(patch_size=16, width=32, layers=1, heads=2,
                            output_dim=16)
    x = jnp.zeros((2, 64, 64, 3))
    vs = vit.init(jax.random.PRNGKey(0), x)
    y = vit.apply(vs, x)
    assert y.shape == (2, 16)
