"""Pallas flash attention vs XLA softmax-attention oracle (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.ops.flash_attention import flash_mha, flash_attention_supported


def _oracle(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def test_flash_mha_matches_oracle():
    rng = np.random.default_rng(11)
    b, h, l, d = 2, 4, 1024, 32
    q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.float32)

    assert flash_attention_supported(q.shape)
    got = np.asarray(flash_mha(q, k, v))
    want = np.asarray(_oracle(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_supported_gate():
    assert not flash_attention_supported((2, 4, 100, 32))   # unaligned L
    assert not flash_attention_supported((2, 4, 256, 32))   # too small
    assert not flash_attention_supported((2, 4, 1024, 48))  # odd head dim


def test_packed_kernel_matches_oracle():
    from fudanocr_tpu.ops.flash_attention import (flash_mha_packed,
                                                  flash_packed_supported)

    rng = np.random.default_rng(12)
    b, heads, l, dh = 2, 4, 512, 32
    d = heads * dh
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    assert flash_packed_supported(l, l, d, heads)

    got = np.asarray(flash_mha_packed(q, k, v, heads))
    # oracle: reshape to (B, H, L, Dh), per-head softmax attention
    def split(x):
        return x.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
    o = _oracle(split(q), split(k), split(v))
    want = np.asarray(o).transpose(0, 2, 1, 3).reshape(b, l, d)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_mha_gradients_match_xla():
    """custom_vjp backward (XLA-recomputed probs) vs autodiff through the
    plain einsum attention — needed because the seg train step
    differentiates through EfficientAttention's flash path."""
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((1, 2, 512, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 32)), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_mha(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_oracle(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
