"""Image/recognition metrics.

PSNR and SSIM reproduce scene-text-telescope/utils/ssim_psnr.py:9-135:
PSNR on [0, 1] RGB scaled x255 against MSE; SSIM with an 11x11 gaussian
window (sigma 1.5) applied per channel, C1/C2 from K1=0.01/K2=0.03, L=1.
Both are jittable; SSIM's window convolution is one depthwise conv that XLA
fuses into the eval graph (the reference runs a separate conv2d per metric
call on GPU).
"""

from __future__ import annotations

import string
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Peak signal-to-noise ratio over [0,1] images (any shape, batched ok)."""
    mse = jnp.mean(((img1 * 255.0) - (img2 * 255.0)) ** 2)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over NHWC [0,1] images (gaussian window, per channel)."""
    c = img1.shape[-1]
    w = _gaussian_window(window_size)
    # depthwise kernel (H, W, in_ch=1, ch_mult=1) applied per channel
    kernel = jnp.asarray(w)[:, :, None, None] * jnp.ones((1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel.astype(jnp.float32),
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def str_filt(s: str, voc_type: str = "lower") -> str:
    """Vocabulary filtering (utils/util.py:12-24): keep only chars in the
    vocabulary, lowercase the result."""
    alpha_dict = {
        "digit": string.digits,
        "lower": string.digits + string.ascii_lowercase,
        "upper": string.digits + string.ascii_letters,
        "all": string.digits + string.ascii_letters + string.punctuation,
    }
    if voc_type == "lower":
        s = s.lower()
    s = "".join(ch for ch in s if ch in alpha_dict[voc_type])
    return s.lower()


def sequence_accuracy(preds: list, gts: list, voc_type: str = "lower") -> float:
    """Exact-match accuracy after vocabulary filtering."""
    if not gts:
        return 0.0
    hits = sum(1 for p, g in zip(preds, gts)
               if str_filt(p, voc_type) == str_filt(g, voc_type))
    return hits / len(gts)
