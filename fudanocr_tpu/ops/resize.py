"""torch-exact bicubic resize as two static matmuls.

The reference feeds its CRNN evaluator through
`torch.nn.functional.interpolate(x, (32, 100), mode='bicubic')`
(scene-text-telescope/interfaces/base.py:319-325). torch's bicubic uses
the Keys kernel with a = -0.75, align_corners=False, NO antialiasing,
and border-clamped taps — while `jax.image.resize(..., 'bicubic')` uses
a = -0.5 WITH antialiasing on downscale, so the two disagree numerically
and would break ported-weight logit parity through the evaluator.

Bicubic resize is linear in the input, so we precompute the exact
(out, in) interpolation matrix per axis at trace time (shapes are
static under jit) and apply it as two einsums — which on TPU is also
faster than a gather-based resample: the H and W contractions run on
the MXU and fuse with neighbors.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (the a=-0.75 variant torch uses)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0))
    return w


@lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) float32 matrix M with out = M @ in, matching
    torch upsample_bicubic2d (align_corners=False): source coordinate
    (j + 0.5) * n_in / n_out - 0.5, 4 taps, indices clamped to the border
    (duplicate-border weights accumulate)."""
    scale = n_in / n_out
    m = np.zeros((n_out, n_in), np.float64)
    for j in range(n_out):
        center = (j + 0.5) * scale - 0.5
        i_floor = int(np.floor(center))
        frac = center - i_floor
        taps = np.arange(i_floor - 1, i_floor + 3)
        w = _cubic(center - taps)
        taps = np.clip(taps, 0, n_in - 1)
        for t, wt in zip(taps, w):
            m[j, t] += wt
    return m.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC bicubic resize bit-matching torch F.interpolate(mode='bicubic',
    align_corners=False, antialias=False) to float tolerance.

    Values may overshoot [0, 1] exactly as torch's do (no clamping)."""
    h_out, w_out = out_hw
    b, h_in, w_in, c = x.shape
    xf = x.astype(jnp.float32)
    if h_out != h_in:
        mh = jnp.asarray(_resize_matrix(h_in, h_out))
        xf = jnp.einsum("oh,bhwc->bowc", mh, xf)
    if w_out != w_in:
        mw = jnp.asarray(_resize_matrix(w_in, w_out))
        xf = jnp.einsum("ow,bhwc->bhoc", mw, xf)
    return xf
