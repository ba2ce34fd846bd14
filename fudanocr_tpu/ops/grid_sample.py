"""Bilinear grid sampling (torch.nn.functional.grid_sample semantics).

The reference relies on cuDNN grid_sample for TPS rectification
(scene-text-telescope/model/tps_spatial_transformer.py:10-18,111). There is
no XLA primitive for it, so it is built from four batched gathers on a
flattened spatial axis — gathers lower to efficient dynamic-slice streams on
TPU — with zero-padding handled by weight masking instead of index clamping.

Defaults match torch: align_corners=False, padding_mode='zeros'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(img: jax.Array, grid: jax.Array,
                         align_corners: bool = False) -> jax.Array:
    """Sample `img` (B, H, W, C) at `grid` (B, Ho, Wo, 2) of xy coords in [-1, 1].

    Returns (B, Ho, Wo, C). Out-of-bounds contributions are zero.
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = grid.shape

    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    flat = img.reshape(b, h * w, c)

    def corner(xc, yc, wgt):
        inb = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        idx = (yi * w + xi).reshape(b, ho * wo)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, ho, wo, c)
        wgt = jnp.where(inb, wgt, 0.0)
        return vals * wgt[..., None].astype(img.dtype)

    out = (corner(x0, y0, wx0 * wy0) + corner(x1, y0, wx1 * wy0)
           + corner(x0, y1, wx0 * wy1) + corner(x1, y1, wx1 * wy1))
    return out
