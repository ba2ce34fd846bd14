"""Region-masked fused attention as a Pallas TPU kernel.

The det-guided segmentation backbone (text-focused-Transformers/mmseg/
models/backbones/cascade_mit.py:4890-4975 `calculate_mask` + the masked
nn.MultiheadAttention calls) suppresses attention pairs whose REGION IDS
ARE EQUAL by adding -1e10 to their score. The reference materialises the
(B, 1, Lq, Lkv) additive mask; at the published det recipe (crop 1024²,
mmseg stage 1 => Lq = 65,536 tokens) that is a ~268 MB fp32 buffer per
image — per mask kind (text + instance), before the attention itself
materialises scores of the same size.

The mask depends only on id EQUALITY, so this kernel takes the (B, Lq)
and (B, Lkv) region-id VECTORS and computes the suppression in-kernel per
(bq, Lkv) tile: O(Lq + Lkv) HBM traffic instead of O(Lq x Lkv). The
backward kernel regenerates the same mask from the same vectors, so
nothing quadratic is ever resident.

Semantics match the reference exactly: the mask is ADDITIVE (-1e10), so a
fully-suppressed row degrades to the plain softmax of its scores (the
constant cancels against the row max) — reproduced here because the row
max is taken AFTER adding the mask.

Layout: q is (B, Lq, H*Dh) lane-packed, k/v are (B, Lkv, H*Dh) — the
native Dense outputs, no (B, H, L, Dh) transpose (see
flash_attention._packed_kernel for why that matters on TPU). Lkv is the
sr_ratio-reduced K/V length; at every det-config scale it is <= 2048 so a
whole K/V row fits VMEM and no online softmax is needed; Lq is chunked
over the grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e10  # the reference's suppression constant (cascade_mit.py:4973)


def region_flash_supported(lq: int, lkv: int, d: int, heads: int) -> bool:
    """Shape gate: Lq chunkable, whole K/V row VMEM-resident, MXU-aligned
    head dim. On the CPU backend (tests) the kernels run in Pallas
    INTERPRET mode — a python-level grid loop — so large problems are
    additionally bounded there: correctness coverage needs small shapes,
    and XLA's native einsum path is orders of magnitude faster on CPU."""
    if jax.default_backend() == "cpu" and lq * lkv > 2 ** 24:
        return False
    return (lq >= 1024 and lq % 256 == 0
            and 128 <= lkv <= 2048 and lkv % 128 == 0
            and d % heads == 0 and (d // heads) % 8 == 0 and d <= 512)


def _suppress(rq, rkv):
    """(bq,) ids x (lkv,) ids -> (bq, lkv) additive fp32 mask."""
    return jnp.where(rq[:, None] == rkv[None, :],
                     jnp.float32(_NEG), jnp.float32(0.0))


def _fwd_body(q, k, v, neg, o_ref, *, scale, heads):
    """Per-chunk full-K attention over packed heads; `neg` is the additive
    mask (None for the unmasked variant — same kernel, zero mask)."""
    d = q.shape[-1]
    dh = d // heads
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if neg is not None:
            s = s + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


def _region_fwd_kernel(q_ref, k_ref, v_ref, rq_ref, rkv_ref, o_ref, *,
                       scale, heads):
    neg = _suppress(rq_ref[0, 0], rkv_ref[0, 0])  # (bq, lkv), all heads
    _fwd_body(q_ref[0], k_ref[0], v_ref[0], neg, o_ref,
              scale=scale, heads=heads)


def _plain_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    _fwd_body(q_ref[0], k_ref[0], v_ref[0], None, o_ref,
              scale=scale, heads=heads)


def _bwd_body(q, k, v, do, neg, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
              scale, heads):
    """dk/dv accumulate across the sequential q-chunk grid dim in VMEM
    scratch; dq writes per chunk. Mask regenerated from the id vectors —
    no stored residual beyond q/k/v."""
    d = q.shape[-1]
    dh = d // heads
    qi = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        qc = q[:, sl].astype(jnp.float32)
        kh = k[:, sl].astype(jnp.float32)
        vh = v[:, sl].astype(jnp.float32)
        doc = do[:, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            qc, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if neg is not None:
            s = s + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        dv_acc[:, sl] += jax.lax.dot_general(
            probs, doc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doc, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            ds, qc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == nq - 1)
    def _write():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _region_bwd_kernel(q_ref, k_ref, v_ref, rq_ref, rkv_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                       scale, heads):
    neg = _suppress(rq_ref[0, 0], rkv_ref[0, 0])
    _bwd_body(q_ref[0], k_ref[0], v_ref[0], do_ref[0], neg,
              dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
              scale=scale, heads=heads)


def _plain_bwd_kernel(q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                      scale, heads):
    _bwd_body(q_ref[0], k_ref[0], v_ref[0], do_ref[0], None,
              dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
              scale=scale, heads=heads)


def _chunk(lq: int) -> int:
    return 512 if lq % 512 == 0 else 256


@functools.partial(jax.jit, static_argnames=("heads",))
def _region_fwd(q, k, v, rq, rkv, heads: int):
    b, lq, d = q.shape
    lkv = k.shape[1]
    bq = _chunk(lq)
    grid = (b, lq // bq)
    # id vectors travel as (B, 1, L): a (1, 1, chunk) block keeps the
    # second-minor block dim equal to the array dim, which Mosaic
    # requires once B > 1 (a (1, chunk) block of a (B, L) array is
    # rejected for B >= 2)
    rq, rkv = rq[:, None, :], rkv[:, None, :]
    return pl.pallas_call(
        functools.partial(_region_fwd_kernel,
                          scale=1.0 / math.sqrt(d // heads), heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * lq * lkv * (d // heads),
            transcendentals=b * heads * lq * lkv,
            bytes_accessed=2 * b * (lq + 2 * lkv) * d * 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, lkv, d), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, lkv, d), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, bq), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, lkv), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, rq, rkv)


@functools.partial(jax.jit, static_argnames=("heads",))
def _region_bwd(q, k, v, rq, rkv, do, heads: int):
    b, lq, d = q.shape
    lkv = k.shape[1]
    bq = _chunk(lq)
    grid = (b, lq // bq)
    rq, rkv = rq[:, None, :], rkv[:, None, :]  # see _region_fwd
    kv_spec = pl.BlockSpec((1, lkv, d), lambda bi, qi: (bi, 0, 0))
    return pl.pallas_call(
        functools.partial(_region_bwd_kernel,
                          scale=1.0 / math.sqrt(d // heads), heads=heads),
        out_shape=[jax.ShapeDtypeStruct((b, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, lkv, d), k.dtype),
                   jax.ShapeDtypeStruct((b, lkv, d), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * heads * lq * lkv * (d // heads),
            transcendentals=b * heads * lq * lkv,
            bytes_accessed=4 * b * (lq + 2 * lkv) * d * 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
            kv_spec, kv_spec,
            pl.BlockSpec((1, 1, bq), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, lkv), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
            kv_spec, kv_spec,
        ],
        scratch_shapes=[pltpu.VMEM((lkv, d), jnp.float32),
                        pltpu.VMEM((lkv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, rq, rkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def region_flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
                     rq: jax.Array, rkv: jax.Array,
                     heads: int) -> jax.Array:
    """softmax(q k^T / sqrt(dh) + M) v with M[i,j] = -1e10 where
    rq[i] == rkv[j], over lane-packed (B, L, H*Dh) tensors.

    `rq` (B, Lq) / `rkv` (B, Lkv) are fp32 region-id vectors (the region
    map resized to the q and K/V grids, flattened). They are treated as
    non-differentiable data (the reference's masks pass through numpy /
    .long() so carry no gradient either)."""
    return _region_fwd(q, k, v, rq, rkv, heads)


def _region_vjp_fwd(q, k, v, rq, rkv, heads):
    return _region_fwd(q, k, v, rq, rkv, heads), (q, k, v, rq, rkv)


def _region_vjp_bwd(heads, res, do):
    q, k, v, rq, rkv = res
    dq, dk, dv = _region_bwd(q, k, v, rq, rkv, do, heads)
    return dq, dk, dv, jnp.zeros_like(rq), jnp.zeros_like(rkv)


region_flash_mha.defvjp(_region_vjp_fwd, _region_vjp_bwd)


# ---------------------------------------------------------------------------
# Unmasked variant — same kernels with a zero mask. This gives the
# EfficientAttention cross-attention (Lq != Lkv) path a PALLAS backward:
# the previous flash_mha custom-VJP recomputed probabilities through XLA
# einsums, materialising (B, H, Lq, Lkv) fp32 three times over — 268 MB
# per buffer for stage 1 at crop 1024². It also takes the native packed
# (B, L, H*Dh) layout, skipping the (B, H, L, Dh) transposes.
# ---------------------------------------------------------------------------


def packed_flash_supported(lq: int, lkv: int, d: int, heads: int) -> bool:
    return region_flash_supported(lq, lkv, d, heads)


@functools.partial(jax.jit, static_argnames=("heads",))
def _plain_fwd(q, k, v, heads: int):
    b, lq, d = q.shape
    lkv = k.shape[1]
    bq = _chunk(lq)
    return pl.pallas_call(
        functools.partial(_plain_fwd_kernel,
                          scale=1.0 / math.sqrt(d // heads), heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * lq * lkv * (d // heads),
            transcendentals=b * heads * lq * lkv,
            bytes_accessed=2 * b * (lq + 2 * lkv) * d * 2),
        grid=(b, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, lkv, d), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, lkv, d), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("heads",))
def _plain_bwd(q, k, v, do, heads: int):
    b, lq, d = q.shape
    lkv = k.shape[1]
    bq = _chunk(lq)
    kv_spec = pl.BlockSpec((1, lkv, d), lambda bi, qi: (bi, 0, 0))
    return pl.pallas_call(
        functools.partial(_plain_bwd_kernel,
                          scale=1.0 / math.sqrt(d // heads), heads=heads),
        out_shape=[jax.ShapeDtypeStruct((b, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, lkv, d), k.dtype),
                   jax.ShapeDtypeStruct((b, lkv, d), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * heads * lq * lkv * (d // heads),
            transcendentals=b * heads * lq * lkv,
            bytes_accessed=4 * b * (lq + 2 * lkv) * d * 2),
        grid=(b, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
            kv_spec, kv_spec,
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0)),
            kv_spec, kv_spec,
        ],
        scratch_shapes=[pltpu.VMEM((lkv, d), jnp.float32),
                        pltpu.VMEM((lkv, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def packed_flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
                     heads: int) -> jax.Array:
    """Unmasked softmax(q k^T / sqrt(dh)) v over lane-packed (B, L, H*Dh)
    q and (B, Lkv, H*Dh) k/v, with a Pallas backward (q-chunked, dk/dv
    accumulated in VMEM scratch — no O(Lq x Lkv) HBM buffer either way)."""
    return _plain_fwd(q, k, v, heads)


def _plain_vjp_fwd(q, k, v, heads):
    return _plain_fwd(q, k, v, heads), (q, k, v)


def _plain_vjp_bwd(heads, res, do):
    q, k, v = res
    return _plain_bwd(q, k, v, do, heads)


packed_flash_mha.defvjp(_plain_vjp_fwd, _plain_vjp_bwd)
