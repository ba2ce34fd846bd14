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


def test_packed_dropout_matches_masked_oracle():
    """The dropout kernel vs an XLA oracle applying the SAME hash-derived
    keep mask to true softmax probabilities (mask semantics: drop AFTER
    normalisation, scale by 1/keep — torch F.dropout on attn weights)."""
    from fudanocr_tpu.ops.flash_attention import (dropout_keep_oracle,
                                                  flash_mha_packed_dropout)

    rng = np.random.default_rng(31)
    b, heads, l, dh, rate = 2, 4, 512, 32, 0.1
    d = heads * dh
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    seed = jnp.uint32(1234)

    keep = dropout_keep_oracle(b, heads, l, seed, rate)  # (B,H,L,L)
    frac = float(jnp.mean(keep))
    assert abs(frac - (1 - rate)) < 5e-3  # hash quality: keep fraction

    def split(x):
        return x.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)

    def oracle(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / np.sqrt(dh)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        p = jnp.where(keep, p, 0.0) / (1 - rate)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v).astype(jnp.float32))
        return o.transpose(0, 2, 1, 3).reshape(b, l, d)

    got = np.asarray(flash_mha_packed_dropout(q, k, v, seed, heads, rate))
    want = np.asarray(oracle(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # different seed -> different mask -> different output
    other = np.asarray(flash_mha_packed_dropout(q, k, v, jnp.uint32(99),
                                                heads, rate))
    assert np.abs(other - got).max() > 1e-3
    # same seed -> bit-identical (the bwd kernel depends on this)
    again = np.asarray(flash_mha_packed_dropout(q, k, v, seed, heads, rate))
    np.testing.assert_array_equal(got, again)

    # gradients: the Pallas bwd kernel regenerates the mask
    def loss_kernel(q, k, v):
        return (flash_mha_packed_dropout(q, k, v, seed, heads, rate)
                ** 2).sum()

    def loss_oracle(q, k, v):
        return (oracle(q, k, v) ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=5e-3, atol=5e-3)


def test_qkv_packed_variants_match_split_kernels():
    """The fused-[q|k|v] kernels must equal the split-input kernels exactly
    (they share the math; only the input layout differs), including the
    dropout variant's gradients routed through the fused dqkv buffer."""
    from fudanocr_tpu.ops.flash_attention import (flash_mha_packed,
                                                  flash_mha_packed_dropout,
                                                  flash_mha_qkv_packed,
                                                  flash_mha_qkv_packed_dropout)

    rng = np.random.default_rng(41)
    b, heads, l, dh, rate = 2, 4, 512, 32, 0.1
    d = heads * dh
    q = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    seed = jnp.uint32(77)

    np.testing.assert_array_equal(
        np.asarray(flash_mha_qkv_packed(qkv, heads)),
        np.asarray(flash_mha_packed(q, k, v, heads)))
    np.testing.assert_array_equal(
        np.asarray(flash_mha_qkv_packed_dropout(qkv, seed, heads, rate)),
        np.asarray(flash_mha_packed_dropout(q, k, v, seed, heads, rate)))

    def loss_fused(qkv):
        return (flash_mha_qkv_packed_dropout(qkv, seed, heads, rate)
                ** 2).sum()

    def loss_split(q, k, v):
        return (flash_mha_packed_dropout(q, k, v, seed, heads, rate)
                ** 2).sum()

    g_fused = jax.grad(loss_fused)(qkv)
    gq, gk, gv = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(g_fused),
                               np.asarray(jnp.concatenate([gq, gk, gv],
                                                          axis=-1)),
                               rtol=1e-5, atol=1e-5)


def test_dropout_kernels_handle_256_aligned_lengths():
    """flash_packed_supported admits any L % 256 == 0 in [512, 2048]; the
    chunked dropout kernels must handle L=768 (not % 512) — regression for
    a chunk/mask shape mismatch at those lengths."""
    from fudanocr_tpu.ops.flash_attention import (dropout_keep_oracle,
                                                  flash_mha_qkv_packed_dropout,
                                                  flash_packed_supported)

    rng = np.random.default_rng(51)
    b, heads, l, dh, rate = 1, 2, 768, 32, 0.1
    d = heads * dh
    assert flash_packed_supported(l, l, d, heads)
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * d)), jnp.float32)
    seed = jnp.uint32(5)

    keep = dropout_keep_oracle(b, heads, l, seed, rate)

    def split(x):
        return x.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / np.sqrt(dh)
    p = jnp.where(keep, jax.nn.softmax(s, axis=-1), 0.0) / (1 - rate)
    want = jnp.einsum("bhqk,bhkd->bhqd", p, split(v)).transpose(
        0, 2, 1, 3).reshape(b, l, d)

    def loss(qkv):
        return (flash_mha_qkv_packed_dropout(qkv, seed, heads, rate)
                ** 2).sum()

    got = flash_mha_qkv_packed_dropout(qkv, seed, heads, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    g = jax.grad(loss)(qkv)  # bwd kernel covers the same chunking
    assert np.isfinite(np.asarray(g)).all()


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
