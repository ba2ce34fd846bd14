"""The whole TBSRN residual block (SRB) as ONE Pallas TPU kernel.

The reference SRB (scene-text-telescope/model/tbsrn.py:229-257) is
conv3x3 -> BN -> mish -> conv3x3 -> BN -> FeatureEnhancer -> +residual.
Round 3 fused the enhancer (ops/fused_enhancer.py); profiling the
resulting program (scripts/profile_tbsrn.py) showed the next cost after
the kernel itself is the KERNEL BOUNDARY: XLA lays the surrounding convs
out batch-minor ({0,3,2,1}) while the Pallas call requires the default
layout, so every SRB pays two full (B, H, W, C) relayout copies
(~3.6 ms/forward at batch 512) plus HBM round-trips for the conv chain
and the residual add. Fusing the entire SRB removes the boundary: the
only convs left at the XLA level are the stem/tail/upsample ones at the
ends of the network.

In-kernel design (one image per grid step, everything VMEM-resident):
  * the two 3x3 convs run as 9 shifted (L, C) x (C, C) matmuls over the
    row-major (L = H*W, C) token matrix; W-edge validity is a per-row
    mask (rows where w+dx walks off the image), H edges fall out of the
    zero-padded row shifts for free;
  * inference BN is an affine transform, so it is FOLDED into the conv
    weights outside the kernel (W' = W * gamma/sqrt(var+eps), b' handled
    likewise) — zero in-kernel cost;
  * mish = x * tanh(softplus(x)) on the VPU between the convs;
  * the enhancer math is the shared `enhancer_body` from
    ops/fused_enhancer.py (PE-qkv hoisting, exp2 softmax, MXU-side
    denominator);
  * the block residual (input + enhancer projection) is added before the
    single output write.

Inference-only, like the fused enhancer: the training path keeps the
composable module chain (BN needs batch stats, dropout needs masks).
Parity vs the unfused TransformerResidualBlock is tested in
tests/test_fused_srb.py (fp32 tight, bf16 loose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fudanocr_tpu.ops.fused_enhancer import (enhancer_body,
                                             enhancer_operands,
                                             fused_enhancer_supported)


def fused_srb_supported(h: int, w: int, c: int, heads: int) -> bool:
    return fused_enhancer_supported(h * w, c + 64, heads) and c % 8 == 0


def fold_bn(kernel: jax.Array, bias: jax.Array, bn_params: dict,
            bn_stats: dict, eps: float = 1e-5):
    """Fold inference BatchNorm into the preceding conv: returns (W', b')
    with W' = W * s, b' = (b - mean) * s + beta, s = gamma/sqrt(var+eps).
    Matches flax nn.BatchNorm(use_running_average=True) exactly in fp32."""
    s = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + eps)
    return kernel * s, (bias - bn_stats["mean"]) * s + bn_params["bias"]


def _conv3x3(x2d: jax.Array, w_ref, b_ref, width: int, dt) -> jax.Array:
    """SAME-padded 3x3 conv on row-major (L, C) tokens; returns fp32.

    Runs as ONE im2col matmul (L, 9C) x (9C, Cout) instead of nine
    per-tap (L, C) x (C, C) dots: the contraction dim 9C (= 576 at the
    flagship C=64) spans full 128-lane MXU tiles, where each C=64 tap
    would pad its contraction to 128 and double the MXU passes.
    w_ref is (9*C, Cout): tap (dy+1)*3+(dx+1) lives in rows
    [tap*C, (tap+1)*C). Row r = h*width + w of the output reads input row
    r + dy*width + dx, masked where w+dx leaves [0, width)."""
    l, c = x2d.shape
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) % width
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = dy * width + dx
            if s > 0:
                shifted = jnp.concatenate(
                    [x2d[s:], jnp.zeros((s, c), x2d.dtype)], axis=0)
            elif s < 0:
                shifted = jnp.concatenate(
                    [jnp.zeros((-s, c), x2d.dtype), x2d[:l + s]], axis=0)
            else:
                shifted = x2d
            if dx:
                valid = jnp.logical_and(w_ids + dx >= 0, w_ids + dx < width)
                shifted = jnp.where(valid, shifted, 0)
            taps.append(shifted)
    cols = jnp.concatenate(taps, axis=-1)              # (L, 9C) im2col
    return jax.lax.dot_general(
        cols.astype(dt), w_ref[...].astype(dt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b_ref[...].astype(jnp.float32)


def _mish32(v32: jax.Array) -> jax.Array:
    return v32 * jnp.tanh(jax.nn.softplus(v32))


def _srb_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                pe_ref, peqkv_ref, wtop_ref, wout_ref, bout_ref,
                s1_ref, bl1_ref, wf1_ref, bf1_ref, wf2_ref, bf2_ref,
                s2_ref, bl2_ref, wp_ref, bp_ref, o_ref, attn_ref, *,
                width: int, heads: int, eps: float):
    dt = x_ref.dtype
    hh, ww, c = x_ref.shape[1:]
    x2d = x_ref[0].reshape(hh * ww, c)

    r = _conv3x3(x2d, w1_ref, b1_ref, width, dt)          # conv1+bn1 (folded)
    r = _mish32(r).astype(dt)
    r = _conv3x3(r, w2_ref, b2_ref, width, dt).astype(dt)  # conv2+bn2

    out = enhancer_body(
        r, pe_ref, peqkv_ref, wtop_ref, wout_ref, bout_ref,
        s1_ref, bl1_ref, wf1_ref, bf1_ref, wf2_ref, bf2_ref,
        s2_ref, bl2_ref, wp_ref, bp_ref, attn_ref, heads=heads, eps=eps)
    y = (x2d.astype(jnp.float32) + out).astype(o_ref.dtype)
    o_ref[0] = y.reshape(hh, ww, c)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "bn_eps"))
def fused_srb(x: jax.Array, conv_params: dict, bn_stats: dict,
              enh_params: dict, pe: jax.Array, heads: int = 4,
              eps: float = 1e-6, bn_eps: float = 1e-5) -> jax.Array:
    """Run one full SRB on (B, H, W, C) features.

    `conv_params` holds conv1/conv2/bn1/bn2 param subtrees as created by
    TransformerResidualBlock; `bn_stats` the matching batch_stats;
    `enh_params` the FeatureEnhancer subtree; `pe` the (L, 64) positional
    encoding rows."""
    b, hh, ww, c = x.shape
    l = hh * ww
    d = c + pe.shape[-1]
    dt = x.dtype

    w1, b1 = fold_bn(conv_params["conv1"]["kernel"],
                     conv_params["conv1"]["bias"],
                     conv_params["bn1"], bn_stats["bn1"], bn_eps)
    w2, b2 = fold_bn(conv_params["conv2"]["kernel"],
                     conv_params["conv2"]["bias"],
                     conv_params["bn2"], bn_stats["bn2"], bn_eps)
    conv_in = [w1.reshape(9 * c, c), b1.reshape(1, c),
               w2.reshape(9 * c, c), b2.reshape(1, c)]
    shared_in = conv_in + enhancer_operands(enh_params, pe, c, dt)
    shared = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in shared_in]

    conv_flops = 2 * (2 * b * l * 9 * c * c)
    dh = d // heads
    enh_flops = 2 * b * l * (c * 3 * d + heads * 2 * l * dh + d * d
                             + 2 * d * d + d * c)
    return pl.pallas_call(
        functools.partial(_srb_kernel, width=ww, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), dt),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0))]
        + shared,
        out_specs=pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((l, d), dt)],
        cost_estimate=pl.CostEstimate(
            flops=conv_flops + enh_flops,
            transcendentals=b * heads * l * l + 4 * b * l + 2 * b * l * c,
            bytes_accessed=2 * b * l * c * jnp.dtype(dt).itemsize,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, *shared_in)
