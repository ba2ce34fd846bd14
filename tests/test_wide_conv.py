"""Parity of the lane-packed narrow-output conv (ops/wide_conv) against
plain lax.conv — the SR nets' 9x9 64->3 RGB head re-blocked for MXU lane
utilization. Same MACs in a different order, so agreement is
fp32-rounding-tight."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.ops.wide_conv import NarrowOutputConv, wide_output_conv


def _ref_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def test_wide_output_conv_matches_lax_conv_fp32():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 128, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (9, 9, 64, 3)) * 0.05
    b = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    want = np.asarray(_ref_conv(x, k, b))
    for block in (16, 32):
        got = np.asarray(wide_output_conv(x, k, b, block=block))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wide_output_conv_grad_matches():
    """The widened-kernel construction is jnp ops, so the VJP must
    accumulate back onto the original (9,9,64,3) kernel identically."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64, 8), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8, 3)) * 0.1
    b = jnp.zeros((3,), jnp.float32)
    g_ref = jax.grad(lambda k: _ref_conv(x, k, b).sum())(k)
    g_wide = jax.grad(
        lambda k: wide_output_conv(x, k, b, block=16).sum())(k)
    np.testing.assert_allclose(np.asarray(g_wide), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_module_param_tree_and_fallback():
    """NarrowOutputConv creates the same param tree as nn.Conv (same
    names, shapes, and init values — the checkpoint porter relies on it)
    and its block=0 fallback equals the blocked path."""
    import flax.linen as nn

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 64, 16)).astype(np.float32))
    ref = nn.Conv(3, (9, 9), name="out_conv")
    mod = NarrowOutputConv(3, (9, 9), block=32, name="out_conv")
    v_ref = ref.init(jax.random.PRNGKey(7), x)
    v = mod.init(jax.random.PRNGKey(7), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_ref))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(ref.apply(v_ref, x))
    got = np.asarray(mod.apply(v, x))          # W=64 % 32 == 0: blocked
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    off = NarrowOutputConv(3, (9, 9), block=0, name="out_conv")
    got_off = np.asarray(off.apply(v, x))
    np.testing.assert_allclose(got_off, want, rtol=1e-5, atol=1e-5)


def test_bf16_parity_with_plain_conv():
    x = (jax.random.normal(jax.random.PRNGKey(4), (2, 32, 128, 64))
         * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(5), (9, 9, 64, 3))
         * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((3,), jnp.float32)
    want = np.asarray(_ref_conv(x, k, b), np.float32)
    got = np.asarray(wide_output_conv(x, k, b, block=32), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
