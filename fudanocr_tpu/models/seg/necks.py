"""Segmentation necks: FPN, MultiLevel, MLA, JPU, IC.

Rebuilds of text-focused-Transformers/mmseg/models/necks/*.py — kept
because the reference ships them even though the textformer configs don't
use them; downstream configs can insert any between backbone and head.
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


class _ConvBNReLU(nn.Module):
    """ConvModule(conv->BN->ReLU) equivalent."""

    features: int
    kernel: int = 3
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


def _up_to(t, ref_hw):
    return jax.image.resize(
        t, (t.shape[0], ref_hw[0], ref_hw[1], t.shape[3]), "bilinear")


class JPU(nn.Module):
    """FastFCN Joint Pyramid Upsampling (necks/jpu.py:12-131): project
    each level to mid_channels, upsample to the finest, concat, then four
    parallel depthwise-separable dilated convs (1,2,4,8) concatenated."""

    mid_channels: int = 512
    dilations: Sequence[int] = (1, 2, 4, 8)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jax.Array],
                 train: bool = False) -> List[jax.Array]:
        feats = [_ConvBNReLU(self.mid_channels, 3, dtype=self.dtype,
                             name=f"conv{i}")(x, train)
                 for i, x in enumerate(inputs)]
        hw = feats[0].shape[1:3]
        feats = [feats[0]] + [_up_to(f, hw) for f in feats[1:]]
        feat = jnp.concatenate(feats, axis=-1)
        branches = []
        for i, d in enumerate(self.dilations):
            y = _ConvBNReLU(feat.shape[-1], 3, dilation=d,
                            groups=feat.shape[-1], relu=False,
                            dtype=self.dtype, name=f"dw{i}")(feat, train)
            y = _ConvBNReLU(self.mid_channels, 1, dtype=self.dtype,
                            name=f"pw{i}")(y, train)
            branches.append(y)
        concat = jnp.concatenate(branches, axis=-1)
        return list(inputs[:-1]) + [concat]


class MLANeck(nn.Module):
    """SETR multi-level aggregation (necks/mla_neck.py): per-level LN +
    1x1 projection, top-down cumulative sum, 3x3 extraction per level."""

    out_channels: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jax.Array],
                 train: bool = False) -> List[jax.Array]:
        proj = []
        for i, x in enumerate(inputs):
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{i}")(x)
            proj.append(_ConvBNReLU(self.out_channels, 1, dtype=self.dtype,
                                    name=f"proj{i}")(x, train))
        mids = []
        for feat in proj[::-1]:  # coarsest first, cumulative add
            mids.append(feat if not mids else mids[-1] + feat)
        outs = [_ConvBNReLU(self.out_channels, 3, dtype=self.dtype,
                            name=f"extract{i}")(m, train)
                for i, m in enumerate(mids)]
        return outs


class CascadeFeatureFusion(nn.Module):
    """ICNet CFF unit (necks/ic_neck.py:8-75): dilated low-res conv +
    1x1 high-res conv, sum, ReLU. Returns (fused, x_low)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_low, x_high, train=False):
        x_low = _up_to(x_low, x_high.shape[1:3])
        x_low = _ConvBNReLU(self.out_channels, 3, dilation=2, relu=False,
                            dtype=self.dtype, name="conv_low")(x_low, train)
        x_high = _ConvBNReLU(self.out_channels, 1, relu=False,
                             dtype=self.dtype, name="conv_high")(
            x_high, train)
        return nn.relu(x_low + x_high), x_low


class ICNeck(nn.Module):
    """ICNet neck (necks/ic_neck.py:78-148): two cascade fusions over the
    3-scale pyramid; returns (aux24, aux12, decode) like the reference."""

    out_channels: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jax.Array], train: bool = False):
        x_sub1, x_sub2, x_sub4 = inputs
        x_cff_24, x_24 = CascadeFeatureFusion(
            self.out_channels, dtype=self.dtype, name="cff_24")(
            x_sub4, x_sub2, train)
        x_cff_12, x_12 = CascadeFeatureFusion(
            self.out_channels, dtype=self.dtype, name="cff_12")(
            x_cff_24, x_sub1, train)
        return [x_24, x_12, x_cff_12]
