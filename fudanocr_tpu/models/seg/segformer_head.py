"""SegFormer decode head (mmseg/models/decode_heads/segformer_head.py:92-147):
per-scale 1x1 conv+BN+ReLU -> bilinear resize to the 1/4 scale -> concat ->
1x1 fusion conv+BN+ReLU -> dropout -> 1x1 classifier."""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class SegformerHead(nn.Module):
    num_classes: int = 2
    channels: int = 256
    dropout_ratio: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jax.Array],
                 train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype,
                                       name=name)
        ref = inputs[0]
        outs = []
        for i, x in enumerate(inputs):
            y = nn.Conv(self.channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            y = nn.relu(bn(f"bn{i}")(y))
            if y.shape[1:3] != ref.shape[1:3]:
                y = jax.image.resize(
                    y, (y.shape[0], ref.shape[1], ref.shape[2], y.shape[3]),
                    "bilinear")
            outs.append(y)
        out = jnp.concatenate(outs, axis=-1)
        out = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="fusion")(out)
        out = nn.relu(bn("fusion_bn")(out))
        if train and self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(out, deterministic=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="cls_seg")(out)
