"""Fused residual+LayerNorm: value AND gradient equality vs direct autodiff
of the unfused torch-semantics formula ((x - mean) / (std + eps), unbiased
std — scene-text-telescope/model/transformer.py LayerNorm)."""

import jax
import jax.numpy as jnp
import numpy as np


def _unfused(x, res, scale, bias, eps=1e-6):
    v = (x + res).astype(jnp.float32)
    n = v.shape[-1]
    mean = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.sum((v - mean) ** 2, axis=-1, keepdims=True) / (n - 1)
    return ((v - mean) / (jnp.sqrt(var) + eps) * scale + bias).astype(x.dtype)


def _inputs(shape=(4, 64, 128), dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], shape, dtype)
    res = jax.random.normal(ks[1], shape, dtype)
    scale = jax.random.normal(ks[2], (shape[-1],)) * 0.2 + 1.0
    bias = jax.random.normal(ks[3], (shape[-1],)) * 0.1
    return x, res, scale, bias


def test_fused_layernorm_value_matches_unfused():
    from fudanocr_tpu.ops.fused_layernorm import fused_residual_layernorm

    x, res, scale, bias = _inputs()  # rows=256, d=128 -> Pallas path
    got = fused_residual_layernorm(x, res, scale, bias)
    want = _unfused(x, res, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_layernorm_grads_match_autodiff():
    from fudanocr_tpu.ops.fused_layernorm import fused_residual_layernorm

    x, res, scale, bias = _inputs(shape=(2, 32, 128))

    def loss_fused(x, res, scale, bias):
        y = fused_residual_layernorm(x, res, scale, bias)
        return jnp.sum(jnp.sin(y) * y)

    def loss_ref(x, res, scale, bias):
        y = _unfused(x, res, scale, bias)
        return jnp.sum(jnp.sin(y) * y)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_fused_layernorm_unaligned_fallback():
    from fudanocr_tpu.ops.fused_layernorm import fused_residual_layernorm

    x, res, scale, bias = _inputs(shape=(3, 7, 64))  # d % 128 != 0
    got = fused_residual_layernorm(x, res, scale, bias)
    want = _unfused(x, res, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_torch_layernorm_residual_arg_matches_preadd():
    from fudanocr_tpu.nn.layers import TorchLayerNorm

    x, res, _, _ = _inputs(shape=(2, 16, 128))
    ln = TorchLayerNorm()
    v = ln.init(jax.random.PRNGKey(1), x)
    # non-trivial affine params
    v = {"params": {"scale": jnp.linspace(0.5, 1.5, 128),
                    "bias": jnp.linspace(-0.2, 0.2, 128)}}
    a = ln.apply(v, x + res)
    b = ln.apply(v, x, residual=res)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)
