"""Encoding layer: learnable residual encoder (EncNet's codebook).

Rebuild of text-focused-Transformers/mmseg/ops/encoding.py:8-74: K
learnable codewords + per-code smoothing scales; soft-assign every
spatial feature to the codewords by scaled L2 distance, then aggregate
the assignment-weighted residuals per code.

(B, H, W, C) NHWC in -> (B, K, C) out. Unreachable from the textformer
configs (it belongs to the EncNet family the fork carries along) but
ported for inventory completeness; the math is three einsums and maps
straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class Encoding(nn.Module):
    channels: int
    num_codes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        assert x.shape[-1] == self.channels
        std = 1.0 / ((self.num_codes * self.channels) ** 0.5)
        codewords = self.param(
            "codewords",
            lambda key: jax.random.uniform(
                key, (self.num_codes, self.channels), jnp.float32,
                -std, std))
        scale = self.param(
            "scale",
            lambda key: jax.random.uniform(
                key, (self.num_codes,), jnp.float32, -1.0, 0.0))

        feats = x.reshape(b, -1, self.channels)          # (B, N, C)
        # scaled L2: scale_k * ||x_n - c_k||^2  -> (B, N, K)
        resid = feats[:, :, None, :] - codewords[None, None]  # (B, N, K, C)
        dist = scale[None, None] * jnp.sum(
            resid.astype(jnp.float32) ** 2, axis=-1)
        assign = jax.nn.softmax(dist, axis=2)            # (B, N, K)
        # aggregate assignment-weighted residuals per code -> (B, K, C)
        out = jnp.einsum("bnk,bnkc->bkc", assign.astype(resid.dtype), resid)
        return out
