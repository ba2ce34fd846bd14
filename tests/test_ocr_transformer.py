"""Shared CTR core: shapes, causality, greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.models.rec.ocr_transformer import OCRTransformer, greedy_decode

TINY = dict(vocab=11, num_in=3, layers=(1, 1, 1, 1), num_heads=4,
            d_embed=32, d_model=64, d_ff=128)


def test_teacher_forced_shapes():
    m = OCRTransformer(**TINY)
    img = jnp.zeros((2, 32, 32, 3))
    text = jnp.zeros((2, 6), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), img, text)
    out = m.apply(vs, img, text)
    assert out["pred"].shape == (2, 6, 11)
    # cross-attn map: (B, heads, L, H/4 * W/4)
    assert out["map"].shape == (2, 4, 6, 64)


def test_causal_mask_blocks_future():
    m = OCRTransformer(**TINY)
    img = jnp.ones((1, 32, 32, 3)) * 0.3
    t1 = jnp.asarray([[1, 2, 3, 0, 0]], jnp.int32)
    t2 = jnp.asarray([[1, 2, 3, 9, 9]], jnp.int32)  # same prefix
    vs = m.init(jax.random.PRNGKey(0), img, t1)
    p1 = np.asarray(m.apply(vs, img, t1)["pred"])
    p2 = np.asarray(m.apply(vs, img, t2)["pred"])
    np.testing.assert_allclose(p1[:, :3], p2[:, :3], rtol=1e-5, atol=1e-5)
    assert np.abs(p1[:, 3:] - p2[:, 3:]).max() > 1e-6


def test_greedy_decode_consistent_with_teacher_forcing():
    m = OCRTransformer(**TINY)
    img = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    text0 = jnp.zeros((2, 5), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), img, text0)

    ids = np.asarray(greedy_decode(m, vs, img, max_len=5))
    assert ids.shape == (2, 5)
    # re-run teacher-forced on the decoded prefix: argmax must reproduce it
    tf_in = np.zeros((2, 6), np.int32)
    tf_in[:, 1:] = ids
    pred = np.asarray(m.apply(vs, img, jnp.asarray(tf_in[:, :5]))["pred"])
    np.testing.assert_array_equal(np.argmax(pred, -1)[:, :5], ids)
