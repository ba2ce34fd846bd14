"""Lane-packed narrow-output convolution (the SR nets' RGB head).

The SR generators end in a 9x9 conv from 64 features down to 3 image
channels (scene-text-telescope/model/tbsrn.py:208-213). On TPU that conv
is lane-starved: the MXU produces 128-wide output tiles, so C_out=3 uses
2.3% of the array — profiled at ~11 TFLOP/s, 5.9 ms of a 61 ms TBSRN
forward at batch 512.

`wide_output_conv` re-blocks the SAME-padded stride-1 conv as a strided
conv whose output channels carry a whole block of W positions:

    y[b, h, F*q + r, c] = (x * K)[...]            F = block, r in [0, F)
      == conv(x_padded, K', stride (1, F))[b, h, q, r*C + c]

with K'[kh, r+kw, :, r*C+c] = K[kh, kw, :, c] (zeros elsewhere). The
kernel widens from kw to kw+F-1 (more MACs, all on zeros) but the output
tile fills F*C lanes instead of C — at F=32, C=3 that is 96/128 lanes vs
3/128, a ~7x net win. The (B, H, W/F, F*C) result reshapes back to
(B, H, W, C) with two *contiguous* reshapes (no transpose, no copy).

This is a pure-XLA rewrite (no Pallas): it is differentiable (the K'
construction is jnp ops, so the VJP accumulates back onto K), runs on any
backend, and computes the same sums as the reference conv in a different
order (fp32 accumulation either way; parity tested in
tests/test_wide_conv.py against lax.conv at fp32/bf16).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def widen_kernel(k: jax.Array, block: int) -> jax.Array:
    """(kh, kw, cin, cout) -> (kh, kw+block-1, cin, block*cout)."""
    parts = [jnp.pad(k, ((0, 0), (r, block - 1 - r), (0, 0), (0, 0)))
             for r in range(block)]
    return jnp.concatenate(parts, axis=-1)


def wide_output_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                     block: int = 32) -> jax.Array:
    """SAME-padded stride-1 conv via the W-blocked strided form.

    x (B, H, W, Cin) NHWC, kernel (kh, kw, Cin, Cout) HWIO with odd kh/kw,
    W % block == 0 and kw - 1 <= block (so one strided window spans the
    whole halo). Computes at the operands' dtype like flax nn.Conv (the
    TPU conv still accumulates fp32 internally for bf16 operands); no
    preferred_element_type so the VJP convs keep uniform dtypes.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    # ValueError (not assert): these preconditions guard output
    # correctness for direct callers bypassing NarrowOutputConv's
    # fallback check, and must survive python -O
    if kh % 2 != 1 or kw % 2 != 1:
        raise ValueError(f"odd kernel required, got {(kh, kw)}")
    if w % block != 0 or kw - 1 > block:
        raise ValueError(
            f"W={w} must be a multiple of block={block} and kw-1={kw - 1}"
            f" <= block (one strided window must span the halo)")
    ph, pw = kh // 2, kw // 2
    kp = widen_kernel(kernel, block)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kp, window_strides=(1, block),
        padding=((ph, ph), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, h, w, cout)
    return y + bias.astype(y.dtype)


class NarrowOutputConv(nn.Module):
    """Drop-in for the SR heads' `nn.Conv(3, (9, 9))`: identical param
    tree (kernel HWIO + bias, same initializers, same name-relative RNG
    fold), lane-packed compute path when the geometry allows it.

    `block=0` (or an incompatible W) falls back to the plain conv, so the
    module is safe at any geometry; parity between the two paths is
    fp32-rounding-tight.
    """

    features: int
    kernel_size: tuple = (9, 9)
    block: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # nn.Conv(dtype=None) promotes via result_type(x, kernel, bias) —
        # with bf16 input and fp32 params that means fp32 compute; match
        # that here so the module stays a true drop-in (advisor r3).
        dt = self.dtype or jnp.result_type(x, kernel, bias)
        xc, kc = x.astype(dt), kernel.astype(dt)
        w = x.shape[2]
        block = self.block
        if block and w % block == 0 and kw - 1 <= block:
            y = wide_output_conv(xc, kc, bias.astype(dt), block)
        else:
            y = jax.lax.conv_general_dilated(
                xc, kc, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + bias.astype(y.dtype)
        return y.astype(dt)
