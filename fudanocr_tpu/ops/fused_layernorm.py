"""Fused residual-add + torch-style LayerNorm as a Pallas TPU kernel.

The reference transformer blocks (scene-text-telescope/model/transformer.py
LayerNorm: (x - mean) / (std + eps), unbiased std) follow every attention /
FFN with `LayerNorm(x + sublayer)`. On TPU the naive lowering is badly
bandwidth-bound: the bf16 residual sum is materialised, re-read and promoted
to fp32 for the two reduction passes, then re-read again for the normalise
pass — profiled ~16 ms of `convert_reduce_fusion` per TBSRN batch-512
forward (22% of the step, scripts/profile_tbsrn.py). This kernel does the
add, both statistics and the normalise in ONE pass over VMEM blocks with
fp32 accumulation in registers: bf16 in, bf16 out, ~3x less HBM traffic.

The backward is plain XLA (jnp) math under a custom_vjp — the fwd kernel is
where the traffic win is, and an XLA backward keeps autodiff exact and
differentiable-through for the frozen-oracle paths that backprop through
deterministic forwards. Value and gradient equality vs direct autodiff of
the unfused formula is tested in tests/test_fused_layernorm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ref_ln(v32: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    """The torch-semantics LN on an fp32 (..., D) tensor (one formula shared
    by the kernel, the XLA fallback and the VJP)."""
    n = v32.shape[-1]
    mean = jnp.mean(v32, axis=-1, keepdims=True)
    d = v32 - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) / max(n - 1, 1)
    return d / (jnp.sqrt(var) + eps) * scale + bias


def _ln_kernel(x_ref, r_ref, s_ref, b_ref, o_ref, *, eps):
    v = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    y = _ref_ln(v, s_ref[...].astype(jnp.float32),
                b_ref[...].astype(jnp.float32), eps)
    o_ref[...] = y.astype(o_ref.dtype)


def _pick_block_rows(rows: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    return 0


def _fwd_impl(x, res, scale, bias, eps: float):
    d = x.shape[-1]
    rows = x.size // d
    block = _pick_block_rows(rows)
    on_cpu = jax.default_backend() == "cpu"
    # interpret mode runs the grid as a python loop — keep CPU tests to a
    # handful of cells (same policy as the attention kernels' size gates)
    if block == 0 or d % 128 != 0 or d > 2048 or (on_cpu and rows // block > 64):
        v = x.astype(jnp.float32) + res.astype(jnp.float32)
        return _ref_ln(v, scale.astype(jnp.float32),
                       bias.astype(jnp.float32), eps).astype(x.dtype)
    x2 = x.reshape(rows, d)
    r2 = res.reshape(rows, d)
    s2 = scale.reshape(1, d)
    b2 = bias.reshape(1, d)
    itemsize = jnp.dtype(x.dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d,
            transcendentals=rows,  # rsqrt per row
            bytes_accessed=3 * rows * d * itemsize,
        ),
        interpret=on_cpu,
    )(x2, r2, s2, b2)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_residual_layernorm(x, res, scale, bias, eps: float = 1e-6):
    """LayerNorm(x + res) with torch (std + eps, unbiased var) semantics.

    One-pass Pallas kernel on TPU (bf16 I/O, fp32 statistics in registers);
    identical-formula XLA fallback for unaligned shapes / big CPU grids.
    scale/bias broadcast over the last axis. Output dtype follows x."""
    return _fwd_impl(x, res, scale, bias, eps)


def _fused_fwd(x, res, scale, bias, eps):
    return _fwd_impl(x, res, scale, bias, eps), (x, res, scale)


def _fused_bwd(eps, saved, g):
    x, res, scale = saved
    v = x.astype(jnp.float32) + res.astype(jnp.float32)
    n = v.shape[-1]
    mean = jnp.mean(v, axis=-1, keepdims=True)
    d = v - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) / max(n - 1, 1)
    sig = jnp.sqrt(var)
    s = sig + eps
    u = d / s                      # pre-affine normalised value
    g32 = g.astype(jnp.float32)
    gy = g32 * scale.astype(jnp.float32)
    # dL/dd_i = gy_i/s - (sum_j gy_j d_j) * d_i / ((n-1) * sig * s^2)
    proj = jnp.sum(gy * d, axis=-1, keepdims=True)
    dd = gy / s - proj * d / (max(n - 1, 1) * jnp.maximum(sig, 1e-30) * s * s)
    dv = dd - jnp.mean(dd, axis=-1, keepdims=True)
    axes = tuple(range(v.ndim - 1))
    dscale = jnp.sum(g32 * u, axis=axes).astype(scale.dtype)
    dbias = jnp.sum(g32, axis=axes).astype(scale.dtype)
    return (dv.astype(x.dtype), dv.astype(res.dtype), dscale, dbias)


fused_residual_layernorm.defvjp(_fused_fwd, _fused_bwd)
