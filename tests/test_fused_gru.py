"""Parity of the Pallas BiGRU kernel (ops/fused_gru) vs the lax.scan path
(nn/recurrent.py), interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.nn.recurrent import BiGRU, SpatialGRU


def test_fused_bigru_matches_scan_fp32():
    rows, t, hidden = 8, 16, 32
    mod = BiGRU(hidden)
    fused = BiGRU(hidden, fuse="force")
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, t, 3 * hidden))
    v = mod.init(jax.random.PRNGKey(1), x)
    v2 = fused.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    want = np.asarray(mod.apply(v, x))
    got = np.asarray(fused.apply(v, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_spatial_gru_matches_scan_both_axes():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16, 12)) * 0.5
    for axis in ("H", "W"):
        mod = SpatialGRU(12, axis=axis)
        fused = SpatialGRU(12, axis=axis, fuse="force")
        v = mod.init(jax.random.PRNGKey(3), x)
        want = np.asarray(mod.apply(v, x))
        got = np.asarray(fused.apply(v, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tsrn_fused_gru_flag_matches_plain():
    """Whole-model check at eval: fused_gru='force' == scan TSRN."""
    from fudanocr_tpu.models.sr import TSRN

    plain = TSRN(scale_factor=2, width=32, height=16, srb_nums=1,
                 hidden_units=4)
    fused = TSRN(scale_factor=2, width=32, height=16, srb_nums=1,
                 hidden_units=4, fused_gru="force")
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 16, 3))
    v = plain.init(jax.random.PRNGKey(5), x)
    want = np.asarray(plain.apply(v, x))
    got = np.asarray(fused.apply(v, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tsrn_fused_gru_train_path_unaffected():
    """train=True must take the scan path (kernel has no VJP): gradients
    exist and match the plain model's."""
    from fudanocr_tpu.models.sr import TSRN

    plain = TSRN(scale_factor=2, width=32, height=16, srb_nums=1,
                 hidden_units=4)
    fused = TSRN(scale_factor=2, width=32, height=16, srb_nums=1,
                 hidden_units=4, fused_gru="force")
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 8, 16, 3))
    v = plain.init(jax.random.PRNGKey(7), x)

    def loss(model, params):
        out, _ = model.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, x, True,
                             mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g1 = jax.grad(lambda p: loss(plain, p))(v["params"])
    g2 = jax.grad(lambda p: loss(fused, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
