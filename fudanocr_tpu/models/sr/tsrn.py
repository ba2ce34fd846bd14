"""TSRN — the TextZoom sequential-residual-block SR net.

Rebuild of scene-text-telescope/model/tsrn.py:18-98 (byte-identical copy in
text-gestalt): same trunk as TBSRN but the residual blocks use two
bidirectional spatial GRUs instead of attention — gru1 scans image rows
(along H, W folded into batch) inside the residual branch, gru2 scans
columns (along W) over `x + residual` and its output IS the block output
(tsrn.py:89-98).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fudanocr_tpu.nn.layers import PReLU, mish
from fudanocr_tpu.nn.recurrent import SpatialGRU
from fudanocr_tpu.nn.stn import STNHead
from fudanocr_tpu.nn.tps import TPSSpatialTransformer
from fudanocr_tpu.ops.wide_conv import NarrowOutputConv
from fudanocr_tpu.models.sr.common import ConvBN, UpsampleBlock

Dtype = Any


class RecurrentResidualBlock(nn.Module):
    features: int
    dtype: Optional[Dtype] = None
    fuse_gru: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        fuse = self.fuse_gru if not train else False  # kernel has no VJP
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(r)
        r = mish(r)
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(r)
        r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(r)
        r = SpatialGRU(self.features, axis="H", dtype=self.dtype,
                       fuse=fuse, name="gru1")(r)
        return SpatialGRU(self.features, axis="W", dtype=self.dtype,
                          fuse=fuse, name="gru2")(x + r)


class TSRN(nn.Module):
    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = False
    hidden_units: int = 32
    dtype: Optional[Dtype] = None
    fused_gru: Any = False  # Pallas BiGRU kernel at inference (TPU
    # backend, supported shapes only — see nn/recurrent.py BiGRU.fuse);
    # training keeps the lax.scan path (the kernel has no VJP).
    # Default set by the on-chip A/B in scripts/bench_sweep_tbsrn.py.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_planes = 4 if self.mask else 3
        feats = 2 * self.hidden_units
        assert math.log2(self.scale_factor).is_integer()
        n_up = int(math.log2(self.scale_factor))

        if self.stn:
            # Construct unconditionally so params exist whichever mode ran
            # init; the warp is only *used* at train time and XLA DCEs the
            # dead branch in eval programs.
            _, ctrl = STNHead(num_ctrlpoints=20, dtype=self.dtype,
                              name="stn_head")(x, train)
            tps = TPSSpatialTransformer(
                output_size=(self.height // self.scale_factor,
                             self.width // self.scale_factor),
                num_control_points=20, margins=(0.05, 0.05), name="tps")
            warped, _ = tps(x, ctrl)
            if train:
                x = warped

        stem = nn.Conv(feats, (9, 9), dtype=self.dtype, name="stem_conv")(x)
        stem = PReLU(name="stem_prelu")(stem)

        h = stem
        for i in range(self.srb_nums):
            h = RecurrentResidualBlock(feats, dtype=self.dtype,
                                       fuse_gru=self.fused_gru,
                                       name=f"srb{i}")(h, train)
        h = ConvBN(feats, dtype=self.dtype, name="trunk_tail")(h, train)

        h = stem + h
        for i in range(n_up):
            h = UpsampleBlock(feats, 2, dtype=self.dtype, name=f"up{i}")(h)
        h = NarrowOutputConv(in_planes, (9, 9), dtype=self.dtype,
                             name="out_conv")(h)
        return jnp.tanh(h)
