"""Basic layers, NHWC, fp32-params / configurable compute dtype.

Numerics intentionally match the PyTorch reference where it deviates from
the textbook (so ported checkpoints reproduce):

* `TorchLayerNorm` — the reference's LayerNorm (scene-text-telescope/
  model/tbsrn.py:23-36) divides by the *Bessel-corrected std + eps*, not
  sqrt(var + eps).
* `mish` — x * tanh(softplus(x)) (tbsrn.py:277-285).
* `PReLU` — torch's default single shared slope initialised to 0.25.
* `pixel_shuffle` — torch channel ordering (c*r^2 + i*r + j) transposed to
  NHWC, so converted checkpoints keep sub-pixel phase.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC sub-pixel upsample: (B,H,W,C*r^2) -> (B,H*r,W*r,C).

    Channel c*r^2 + i*r + j lands at spatial offset (i, j) — identical to
    torch.nn.PixelShuffle once layouts are transposed.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis using (std + eps) in the denominator.

    Pass the transformer-block skip connection as `residual` instead of
    pre-adding it: `LN(x + residual)` then runs as ONE fused Pallas pass
    (ops/fused_layernorm.py) — bf16 in/out, fp32 statistics in registers —
    instead of materialising the sum and re-reading it fp32-promoted for
    each reduction (profiled 22% of the TBSRN batch-512 forward)."""

    eps: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 residual: Optional[jax.Array] = None) -> jax.Array:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        out_dtype = x.dtype if self.dtype is None else self.dtype
        if residual is not None:
            from fudanocr_tpu.ops.fused_layernorm import \
                fused_residual_layernorm
            y = fused_residual_layernorm(x, residual, scale, bias, self.eps)
            return y.astype(out_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(feat - 1, 1)
        y = (xf - mean) / (jnp.sqrt(var) + self.eps)
        y = scale * y + bias
        return y.astype(out_dtype)


class PReLU(nn.Module):
    """PReLU with a single shared learnable slope (torch default, init 0.25)."""

    alpha_init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param("alpha", nn.initializers.constant(self.alpha_init), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ConvBNReLU(nn.Module):
    """conv3x3 + BatchNorm + ReLU block (stn_head.py:13-22 equivalent)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None  # set for SyncBN semantics

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None)(x)
        return nn.relu(x)


def max_pool(x: jax.Array, window: Union[int, Tuple[int, int]],
             strides: Optional[Union[int, Tuple[int, int]]] = None,
             padding: Union[str, Sequence[Tuple[int, int]]] = "VALID") -> jax.Array:
    if isinstance(window, int):
        window = (window, window)
    if strides is None:
        strides = window
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, (list, tuple)):
        padding = [tuple(p) for p in padding]  # per spatial dim only
    return nn.max_pool(x, window, strides, padding)
