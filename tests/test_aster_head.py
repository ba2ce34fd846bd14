"""ASTER attention head: shapes + greedy/beam consistency."""

import jax
import jax.numpy as jnp
import numpy as np


def _make(num_classes=12, t=8, d=16):
    from fudanocr_tpu.models.rec.aster_head import ASTERAttentionHead

    head = ASTERAttentionHead(num_classes=num_classes, in_planes=d,
                              s_dim=16, att_dim=16, max_len=6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, d))
    tgt = jnp.zeros((2, 6), jnp.int32)
    vs = head.init(jax.random.PRNGKey(1), x, tgt)
    return head, vs, x


def test_teacher_forced_shape():
    head, vs, x = _make()
    out = head.apply(vs, x, jnp.zeros((2, 6), jnp.int32))
    assert out.shape == (2, 6, 12)


def test_greedy_matches_beam1():
    head, vs, x = _make()
    ids_g, _ = head.apply(vs, x, method=head.sample)
    ids_b, scores = head.apply(vs, x, 1, 11, method=head.beam_search)
    assert ids_g.shape == (2, 6) and ids_b.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(ids_g), np.asarray(ids_b))


def test_beam_search_scores_nonincreasing_with_width():
    head, vs, x = _make()
    _, s1 = head.apply(vs, x, 1, 11, method=head.beam_search)
    _, s3 = head.apply(vs, x, 3, 11, method=head.beam_search)
    # wider beam can only find equal-or-better sequences
    assert np.all(np.asarray(s3) >= np.asarray(s1) - 1e-5)
