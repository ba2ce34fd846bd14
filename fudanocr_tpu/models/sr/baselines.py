"""SR baseline generators: SRCNN, SRResNet, EDSR, RDN, ESRGAN (RRDBNet).

Rebuilds of scene-text-telescope/model/{srcnn.py:18-53, srresnet.py:14-101}
, edsr.py:35-88, rdn.py:54-93 and text-gestalt/model/esrgan.py:55-87 in
NHWC flax. The reference trains these as comparison baselines with the same
trainer; behavioural quirks preserved:

* SRCNN upsamples FIRST (nearest interpolate) then convolves (srcnn.py:47);
* EDSR's mean-shift uses the DIV2K RGB means and 0.1 residual scaling;
* RRDBNet upsamples with nearest-interpolate + conv (not PixelShuffle).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fudanocr_tpu.nn.layers import PReLU
from fudanocr_tpu.nn.layers import pixel_shuffle

Dtype = Any


class SRCNN(nn.Module):
    scale_factor: int = 2
    in_planes: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        s = self.scale_factor
        x = jax.image.resize(x, (b, h * s, w * s, c), "nearest")
        x = nn.relu(nn.Conv(64, (9, 9), dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(32, (1, 1), dtype=self.dtype, name="conv2")(x))
        return nn.Conv(self.in_planes, (5, 5), dtype=self.dtype,
                       name="conv3")(x)


class _SRResBlock(nn.Module):
    features: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name=n)
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        r = PReLU(name="prelu")(bn("bn1")(r))
        r = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(r)
        return x + bn("bn2")(r)


class SRResNet(nn.Module):
    scale_factor: int = 2
    mask: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_planes = 4 if self.mask else 3
        n_up = int(math.log2(self.scale_factor))
        stem = nn.Conv(64, (9, 9), dtype=self.dtype, name="stem")(x)
        stem = PReLU(name="stem_prelu")(stem)
        h = stem
        for i in range(5):
            h = _SRResBlock(64, dtype=self.dtype, name=f"res{i}")(h, train)
        h = nn.Conv(64, (3, 3), dtype=self.dtype, name="trunk_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="trunk_bn")(h)
        h = stem + h
        for i in range(n_up):
            h = nn.Conv(64 * 4, (3, 3), dtype=self.dtype, name=f"up{i}_conv")(h)
            h = pixel_shuffle(h, 2)
            h = PReLU(name=f"up{i}_prelu")(h)
        h = nn.Conv(in_planes, (9, 9), dtype=self.dtype, name="out_conv")(h)
        return jnp.tanh(h)


class EDSR(nn.Module):
    scale_factor: int = 2
    num_blocks: int = 32
    features: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        rgb_mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = x - rgb_mean
        conv = lambda f, n: nn.Conv(f, (3, 3), use_bias=False,
                                    dtype=self.dtype, name=n)
        h = conv(self.features, "conv_input")(x)
        res = h
        for i in range(self.num_blocks):
            r = nn.relu(conv(self.features, f"res{i}_conv1")(h))
            r = conv(self.features, f"res{i}_conv2")(r)
            h = h + r * 0.1
        h = res + conv(self.features, "conv_mid")(h)
        for i in range(int(math.log2(self.scale_factor))):
            h = conv(self.features * 4, f"up{i}")(h)
            h = pixel_shuffle(h, 2)
        h = conv(3, "conv_output")(h)
        return h + rgb_mean


class _RDB(nn.Module):
    features: int = 64
    num_dense: int = 6
    growth: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_dense):
            y = nn.relu(nn.Conv(self.growth, (3, 3), use_bias=False,
                                dtype=self.dtype, name=f"dense{i}")(h))
            h = jnp.concatenate([h, y], axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fuse")(h)
        return h + x


class RDN(nn.Module):
    scale_factor: int = 2
    features: int = 64
    num_dense: int = 6
    growth: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f_m1 = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        f0 = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(f_m1)
        f1 = _RDB(self.features, self.num_dense, self.growth,
                  dtype=self.dtype, name="rdb1")(f0)
        f2 = _RDB(self.features, self.num_dense, self.growth,
                  dtype=self.dtype, name="rdb2")(f1)
        f3 = _RDB(self.features, self.num_dense, self.growth,
                  dtype=self.dtype, name="rdb3")(f2)
        ff = jnp.concatenate([f1, f2, f3], axis=-1)
        h = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="gff1")(ff)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="gff3")(h)
        h = h + f_m1
        h = nn.Conv(self.features * self.scale_factor ** 2, (3, 3),
                    dtype=self.dtype, name="up_conv")(h)
        h = pixel_shuffle(h, self.scale_factor)
        return nn.Conv(3, (3, 3), dtype=self.dtype, name="conv3")(h)


class _RDB5C(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = x
        feats = []
        for i in range(4):
            inp = jnp.concatenate([x] + feats, axis=-1) if feats else x
            y = nn.leaky_relu(nn.Conv(self.gc, (3, 3), dtype=self.dtype,
                                      name=f"conv{i+1}")(inp), 0.2)
            feats.append(y)
        inp = jnp.concatenate([x] + feats, axis=-1)
        out = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="conv5")(inp)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """ESRGAN generator (text-gestalt/model/esrgan.py:55-87)."""

    scale_factor: int = 2
    nf: int = 64
    nb: int = 23
    gc: int = 32
    out_nc: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        fea = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="conv_first")(x)
        h = fea
        for i in range(self.nb):
            # RRDB: out = rdb3(rdb2(rdb1(x))) * 0.2 + x
            r = h
            for j in range(3):
                r = _RDB5C(self.nf, self.gc, dtype=self.dtype,
                           name=f"rrdb{i}_rdb{j}")(r)
            h = r * 0.2 + h
        trunk = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="trunk_conv")(h)
        fea = fea + trunk
        for i in range(int(math.log2(self.scale_factor))):
            b, hh, ww, c = fea.shape
            fea = jax.image.resize(fea, (b, hh * 2, ww * 2, c), "nearest")
            fea = nn.leaky_relu(nn.Conv(self.nf, (3, 3), dtype=self.dtype,
                                        name=f"upconv{i+1}")(fea), 0.2)
        h = nn.leaky_relu(nn.Conv(self.nf, (3, 3), dtype=self.dtype,
                                  name="HRconv")(fea), 0.2)
        return nn.Conv(self.out_nc, (3, 3), dtype=self.dtype,
                       name="conv_last")(h)


class SRDiscriminator(nn.Module):
    """SRGAN discriminator (srresnet.py:104-145)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = [(64, 1), (64, 2), (128, 1), (128, 2), (256, 1), (256, 2),
                 (512, 1), (512, 2)]
        for i, (f, s) in enumerate(feats):
            x = nn.Conv(f, (3, 3), (s, s), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"conv{i}")(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool 1x1
        x = nn.leaky_relu(nn.Conv(1024, (1, 1), dtype=self.dtype,
                                  name="fc1")(x), 0.2)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="fc2")(x)
        return x.reshape(x.shape[0])


def build_baseline(arch: str, scale_factor: int = 2, mask: bool = False,
                   dtype=None, **_):
    if arch == "srcnn":
        return SRCNN(scale_factor=scale_factor, in_planes=4 if mask else 3,
                     dtype=dtype)
    if arch == "srresnet":
        return SRResNet(scale_factor=scale_factor, mask=mask, dtype=dtype)
    if arch == "edsr":
        return EDSR(scale_factor=scale_factor, dtype=dtype)
    if arch == "rdn":
        return RDN(scale_factor=scale_factor, dtype=dtype)
    if arch == "esrgan":
        return RRDBNet(scale_factor=scale_factor, dtype=dtype)
    raise ValueError(f"unknown SR baseline {arch!r}")
