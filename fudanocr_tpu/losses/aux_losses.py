"""Auxiliary SR losses: gradient prior, total variation, perceptual, GAN.

Rebuilds of scene-text-telescope/loss/{gradient_loss.py:10, percptual_loss.
py:7-50} and the ESRGAN adversarial objective (text-gestalt). The
reference's perceptual loss runs frozen torchvision-VGG16 features; here
the feature extractor is a flax VGG16 trunk whose weights load from a
converted checkpoint (utils/torch_port-style) — with random weights it
still exercises the pathway (random-feature perceptual losses are a known
functioning baseline).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def gradient_prior_loss(sr: jax.Array, hr: jax.Array) -> jax.Array:
    """L1 between spatial gradient-magnitude maps (gradient_loss.py:10-37)."""

    def gmap(img):
        dh = jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :])
        dv = jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :])
        dh = jnp.pad(dh, ((0, 0), (0, 0), (0, 1), (0, 0)))
        dv = jnp.pad(dv, ((0, 0), (0, 1), (0, 0), (0, 0)))
        return jnp.sqrt(dh ** 2 + dv ** 2 + 1e-12)

    return jnp.mean(jnp.abs(gmap(sr) - gmap(hr)))


def total_variation_loss(x: jax.Array) -> jax.Array:
    """TV regulariser (percptual_loss.py:30-47 semantics)."""
    b, h, w, c = x.shape
    dh = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    dw = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    return 2.0 * (dh / count_h + dw / count_w) / b


class VGG16Features(nn.Module):
    """VGG16 trunk up to relu5_3 (the reference slices
    vgg16(pretrained).features[:31], percptual_loss.py:9-12)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        idx = 0
        for block, (f, n) in enumerate(plan):
            for i in range(n):
                x = nn.Conv(f, (3, 3), dtype=self.dtype,
                            name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            if block < 4:
                x = nn.max_pool(x, (2, 2), (2, 2))
        return x


def perceptual_loss(vgg_apply, sr: jax.Array, hr: jax.Array) -> jax.Array:
    """MSE in VGG feature space (percptual_loss.py:17-27).

    `vgg_apply(img)` -> features; the HR branch is stop-gradient'd."""
    f_sr = vgg_apply(sr)
    f_hr = jax.lax.stop_gradient(vgg_apply(hr))
    return jnp.mean((f_sr - f_hr) ** 2)


def gan_generator_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating BCE generator loss (srresnet.py GeneratorLoss style)."""
    return jnp.mean(jax.nn.softplus(-fake_logits))


def gan_discriminator_loss(real_logits: jax.Array,
                           fake_logits: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-real_logits)) \
        + jnp.mean(jax.nn.softplus(fake_logits))
