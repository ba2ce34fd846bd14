"""Segmentation necks: FPN (+ the multilevel identity neck).

Rebuild of text-focused-Transformers/mmseg/models/necks/fpn.py (top-down
lateral fusion) — kept because the reference ships it even though the
textformer configs don't use it; downstream configs can insert it between
backbone and head.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jax.Array],
                 train: bool = False) -> List[jax.Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                (laterals[i].shape[0], laterals[i - 1].shape[1],
                 laterals[i - 1].shape[2], laterals[i].shape[3]),
                "nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name=f"fpn_conv{i}")(l)
            for i, l in enumerate(laterals)
        ]
        return outs


class MultiLevelNeck(nn.Module):
    """Scale-and-project identity neck (necks/multilevel_neck.py)."""

    out_channels: int = 256
    scales: Sequence[float] = (0.5, 1, 2, 4)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jax.Array],
                 train: bool = False) -> List[jax.Array]:
        outs = []
        for i, x in enumerate(inputs):
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"lateral{i}")(x)
            s = self.scales[i] if i < len(self.scales) else 1
            if s != 1:
                y = jax.image.resize(
                    y, (y.shape[0], int(y.shape[1] * s),
                        int(y.shape[2] * s), y.shape[3]), "bilinear")
            outs.append(nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                                name=f"conv{i}")(y))
        return outs
