"""Shared pieces of the SR generators (TSRN / TBSRN family).

The reference duplicates these across scene-text-telescope/model/{tsrn,
tbsrn}.py and text-gestalt; here they exist once.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fudanocr_tpu.nn.layers import mish, pixel_shuffle

Dtype = Any


class UpsampleBlock(nn.Module):
    """conv3x3 to C*r^2 -> pixel shuffle -> mish (tsrn.py:101-114)."""

    features: int
    scale: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.features * self.scale ** 2, (3, 3),
                    dtype=self.dtype, name="conv")(x)
        x = pixel_shuffle(x, self.scale)
        return mish(x)


class ConvBN(nn.Module):
    """conv3x3 + BatchNorm (the mid-trunk block, tsrn.py:35-39)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)
