"""STN localisation head predicting TPS control points.

Rebuild of scene-text-telescope/model/stn_head.py:25-99: six conv3x3+BN+ReLU
blocks with interleaved max-pools collapse a (B, 32, 64, C) image to a
(B, 1, 2, 256) map, an fc+BN+ReLU embeds it, and a zero-weight final fc whose
bias is initialised to a near-border control-point grid emits N xy points.
The 0.1 scaling of the embedding before the final fc is preserved — it keeps
early predictions glued to the identity grid.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from fudanocr_tpu.nn.layers import ConvBNReLU, max_pool

Dtype = Any


def _init_ctrl_bias(num_ctrlpoints: int, margin: float = 0.01) -> np.ndarray:
    per_side = num_ctrlpoints // 2
    xs = np.linspace(margin, 1.0 - margin, per_side)
    top = np.stack([xs, np.full(per_side, margin)], axis=1)
    bottom = np.stack([xs, np.full(per_side, 1.0 - margin)], axis=1)
    return np.concatenate([top, bottom], axis=0).astype(np.float32).ravel()


class STNHead(nn.Module):
    num_ctrlpoints: int = 20
    activation: str = "none"  # 'none' | 'sigmoid'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        if x.shape[1] < 16 or x.shape[2] < 32:
            raise ValueError(
                f"STNHead needs input of at least 16x32 (got "
                f"{x.shape[1]}x{x.shape[2]}): its five pooling stages reduce "
                f"height by 16x and width by 32x (stn_head.py:32-43)")
        for i, feats in enumerate((32, 64, 128, 256, 256, 256)):
            x = ConvBNReLU(feats, dtype=self.dtype, name=f"conv{i}")(x, train)
            if i < 4:
                x = max_pool(x, 2)
            elif i == 4:
                x = max_pool(x, (1, 2))
        b = x.shape[0]
        x = x.reshape(b, -1)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="fc1_bn")(x)
        img_feat = nn.relu(x)

        bias0 = _init_ctrl_bias(self.num_ctrlpoints)
        if self.activation == "sigmoid":
            bias0 = -np.log(1.0 / bias0 - 1.0)
        pts = nn.Dense(
            self.num_ctrlpoints * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(bias0),
            dtype=self.dtype, name="fc2",
        )(0.1 * img_feat)
        if self.activation == "sigmoid":
            pts = jax.nn.sigmoid(pts)
        return img_feat, pts.reshape(-1, self.num_ctrlpoints, 2)
