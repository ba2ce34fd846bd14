"""Thin-plate-spline spatial transformer.

Rebuild of scene-text-telescope/model/tps_spatial_transformer.py:54-112 for
TPU: everything data-independent — the (N+3, N+3) inverse TPS kernel and the
(H*W, N+3) target-coordinate representation — is precomputed in NumPy at
module construction and baked into the compiled program as constants. The
per-image work is two small matmuls and one bilinear grid sample.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from fudanocr_tpu.ops.grid_sample import grid_sample_bilinear

Dtype = Any


def _partial_repr(points_a: np.ndarray, points_b: np.ndarray) -> np.ndarray:
    """TPS radial basis phi(a, b) = 0.5 * r^2 * log(r^2), zero at r=0."""
    diff = points_a[:, None, :] - points_b[None, :, :]
    dist2 = (diff ** 2).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = 0.5 * dist2 * np.log(dist2)
    rep[~np.isfinite(rep)] = 0.0
    return rep.astype(np.float32)


def build_output_control_points(num_control_points: int,
                                margins: Tuple[float, float]) -> np.ndarray:
    """Two rows of control points along top/bottom borders (inset by margins)."""
    margin_x, margin_y = margins
    per_side = num_control_points // 2
    xs = np.linspace(margin_x, 1.0 - margin_x, per_side)
    top = np.stack([xs, np.full(per_side, margin_y)], axis=1)
    bottom = np.stack([xs, np.full(per_side, 1.0 - margin_y)], axis=1)
    return np.concatenate([top, bottom], axis=0).astype(np.float32)


class TPSSpatialTransformer(nn.Module):
    """Warp (B, H, W, C) images by TPS fitted to predicted control points.

    `ctrl_points` are (B, N, 2) xy in [0, 1] image coordinates. Returns the
    rectified images plus the source sampling coordinates.
    """

    output_size: Tuple[int, int]  # (height, width)
    num_control_points: int = 20
    margins: Tuple[float, float] = (0.05, 0.05)
    dtype: Optional[Dtype] = None

    def setup(self):
        n = self.num_control_points
        target_cp = build_output_control_points(n, self.margins)

        forward_kernel = np.zeros((n + 3, n + 3), dtype=np.float32)
        forward_kernel[:n, :n] = _partial_repr(target_cp, target_cp)
        forward_kernel[:n, n] = 1.0
        forward_kernel[n, :n] = 1.0
        forward_kernel[:n, n + 1:] = target_cp
        forward_kernel[n + 1:, :n] = target_cp.T
        inverse_kernel = np.linalg.inv(forward_kernel)

        h, w = self.output_size
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([xs.ravel() / (w - 1), ys.ravel() / (h - 1)],
                          axis=1).astype(np.float32)  # (HW, 2) in xy
        target_repr = np.concatenate(
            [_partial_repr(coords, target_cp), np.ones((h * w, 1), np.float32),
             coords], axis=1)  # (HW, N+3)

        self._inverse_kernel = jnp.asarray(inverse_kernel)
        self._target_repr = jnp.asarray(target_repr)

    def __call__(self, images: jax.Array,
                 ctrl_points: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b = ctrl_points.shape[0]
        h, w = self.output_size
        pad = jnp.zeros((b, 3, 2), dtype=jnp.float32)
        y = jnp.concatenate([ctrl_points.astype(jnp.float32), pad], axis=1)
        mapping = jnp.einsum("ij,bjk->bik", self._inverse_kernel, y)
        source = jnp.einsum("pj,bjk->bpk", self._target_repr, mapping)
        grid = source.reshape(b, h, w, 2)
        grid = jnp.clip(grid, 0.0, 1.0) * 2.0 - 1.0
        warped = grid_sample_bilinear(images, grid)
        return warped, source
