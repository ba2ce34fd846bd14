"""Unit tests for basic layers against NumPy / closed-form oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fudanocr_tpu.nn.layers import TorchLayerNorm, PReLU, mish, pixel_shuffle


def test_mish_matches_formula():
    x = np.linspace(-5, 5, 101, dtype=np.float32)
    got = np.asarray(mish(jnp.asarray(x)))
    want = x * np.tanh(np.log1p(np.exp(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_pixel_shuffle_matches_torch_semantics():
    # torch.nn.PixelShuffle: out[b, c, h*r+i, w*r+j] = in[b, c*r^2 + i*r + j, h, w]
    rng = np.random.default_rng(0)
    b, h, w, c, r = 2, 3, 5, 4, 2
    x_nhwc = rng.standard_normal((b, h, w, c * r * r)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x_nhwc), r))
    # oracle in NCHW
    x_nchw = x_nhwc.transpose(0, 3, 1, 2)
    want = np.zeros((b, c, h * r, w * r), dtype=np.float32)
    for i in range(r):
        for j in range(r):
            for cc in range(c):
                want[:, cc, i::r, j::r] = x_nchw[:, cc * r * r + i * r + j]
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), rtol=1e-6)


def test_torch_layernorm_uses_bessel_std():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 7, 16)).astype(np.float32)
    m = TorchLayerNorm(eps=1e-6)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    std = x.std(-1, ddof=1, keepdims=True)  # Bessel-corrected, as torch .std()
    want = (x - mean) / (std + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prelu_default_slope():
    m = PReLU()
    x = jnp.asarray([-2.0, -1.0, 0.0, 3.0])
    params = m.init(jax.random.PRNGKey(0), x)
    got = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(got, [-0.5, -0.25, 0.0, 3.0], rtol=1e-6)
