"""Region-masked Pallas attention vs the XLA additive-mask oracle.

The kernel must reproduce the reference's calculate_mask semantics
(text-focused-Transformers/mmseg/models/backbones/cascade_mit.py:
4890-4896): -1e10 added where region ids are EQUAL, fully-suppressed rows
degrading to the plain softmax because the constant cancels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _oracle(q, k, v, rq, rkv, heads):
    """Packed-layout additive-mask attention in plain jnp."""
    b, lq, d = q.shape
    lkv = k.shape[1]
    dh = d // heads
    qh = q.reshape(b, lq, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lkv, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lkv, heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    s = s / np.sqrt(dh)
    mask = jnp.where(rq[:, :, None] == rkv[:, None, :],
                     jnp.float32(-1e10), 0.0)[:, None]
    p = jax.nn.softmax(s + mask, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, d)


def _data(b=2, lq=1024, lkv=128, d=32, heads=1, n_regions=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lkv, d), jnp.float32)
    rq = jax.random.randint(ks[3], (b, lq), 0, n_regions).astype(jnp.float32)
    rkv = jax.random.randint(ks[4], (b, lkv), 0,
                             n_regions).astype(jnp.float32)
    return q, k, v, rq, rkv


@pytest.mark.parametrize("heads,d", [(1, 32), (4, 64)])
def test_region_flash_forward_parity(heads, d):
    from fudanocr_tpu.ops.region_attention import (region_flash_mha,
                                                   region_flash_supported)

    q, k, v, rq, rkv = _data(d=d, heads=heads)
    assert region_flash_supported(q.shape[1], k.shape[1], d, heads)
    out = region_flash_mha(q, k, v, rq, rkv, heads)
    ref = _oracle(q, k, v, rq, rkv, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_region_flash_fully_suppressed_rows_degrade_to_plain_softmax():
    """All pairs same-region: the reference's additive -1e10 cancels in
    softmax — the kernel must match, not NaN."""
    from fudanocr_tpu.ops.region_attention import region_flash_mha

    q, k, v, _, _ = _data()
    rq = jnp.zeros((2, 1024), jnp.float32)
    rkv = jnp.zeros((2, 128), jnp.float32)
    out = region_flash_mha(q, k, v, rq, rkv, 1)
    ref = _oracle(q, k, v, rq, rkv, 1)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_region_flash_gradient_parity():
    from fudanocr_tpu.ops.region_attention import region_flash_mha

    q, k, v, rq, rkv = _data(d=64, heads=4)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_kernel(q, k, v):
        return jnp.sum(region_flash_mha(q, k, v, rq, rkv, 4) * w)

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, rq, rkv, 4) * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


def test_efficient_attention_region_routes_match_mask_path():
    """EfficientAttention(region=...) (kernel at gated shapes) must equal
    EfficientAttention(attn_mask=...) (XLA) with the materialised mask."""
    from fudanocr_tpu.models.seg.cascade_mit import EfficientAttention
    from fudanocr_tpu.models.seg.det_guided import (region_attn_mask,
                                                    region_vectors)

    b, h, w, c, nh, sr = 1, 64, 16, 32, 1, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c))
    region = jax.random.randint(jax.random.PRNGKey(1), (b, h, w), 0,
                                3).astype(jnp.float32)
    attn = EfficientAttention(num_heads=nh, sr_ratio=sr)
    variables = attn.init(jax.random.PRNGKey(2), x)
    rq, rkv = region_vectors(region, (h, w), sr)
    from fudanocr_tpu.ops.region_attention import region_flash_supported
    assert region_flash_supported(h * w, (h // sr) * (w // sr), c, nh)
    out_kernel = attn.apply(variables, x, True, None, (rq, rkv))
    mask = region_attn_mask(region, (h, w), sr)
    out_mask = attn.apply(variables, x, True, mask)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_mask),
                               atol=2e-5, rtol=2e-5)


def test_packed_flash_mha_forward_and_grad_parity():
    """Unmasked packed kernel (Pallas fwd+bwd) vs plain softmax attention."""
    from fudanocr_tpu.ops.region_attention import (packed_flash_mha,
                                                   packed_flash_supported)

    q, k, v, _, _ = _data(d=64, heads=2, lq=1024, lkv=256)
    assert packed_flash_supported(1024, 256, 64, 2)

    def oracle(q, k, v):
        b, lq, d = q.shape
        rq = jnp.full((b, lq), -1.0, jnp.float32)       # never-equal ids
        rkv = jnp.full((b, k.shape[1]), -2.0, jnp.float32)
        return _oracle(q, k, v, rq, rkv, 2)

    out = packed_flash_mha(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(q, k, v)),
                               atol=2e-5, rtol=2e-5)

    w = jax.random.normal(jax.random.PRNGKey(7), q.shape)
    gk = jax.grad(lambda *a: jnp.sum(packed_flash_mha(*a, 2) * w),
                  argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(lambda *a: jnp.sum(oracle(*a) * w),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"d{name} mismatch")


def test_efficient_attention_region_small_shape_fallback():
    """Below the gate the region path must fall back to the identical
    additive-mask XLA branch."""
    from fudanocr_tpu.models.seg.cascade_mit import EfficientAttention
    from fudanocr_tpu.models.seg.det_guided import (region_attn_mask,
                                                    region_vectors)

    b, h, w, c, nh, sr = 2, 8, 8, 16, 2, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c))
    region = jax.random.randint(jax.random.PRNGKey(1), (b, h, w), 0,
                                2).astype(jnp.float32)
    attn = EfficientAttention(num_heads=nh, sr_ratio=sr)
    variables = attn.init(jax.random.PRNGKey(2), x)
    rq, rkv = region_vectors(region, (h, w), sr)
    out_kernel = attn.apply(variables, x, True, None, (rq, rkv))
    mask = region_attn_mask(region, (h, w), sr)
    out_mask = attn.apply(variables, x, True, mask)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_mask),
                               atol=1e-6, rtol=1e-6)
