"""Fused (flash-style) multi-head attention as a Pallas TPU kernel.

Replaces the reference's materialised softmax(QK^T)V (scene-text-telescope/
model/tbsrn.py:132-150 and the EfficientMultiheadAttention in
text-focused-Transformers/mmseg/models/backbones/cascade_mit.py:94-215)
with an online-softmax kernel that never writes the L_q x L_k score matrix
to HBM. This matters most for the segmentation backbone, whose stage-1
sequence length is (H/4)*(W/4) (16k tokens for 512x512 crops).

Layout: q, k, v are (B, H, L, Dh). The kernel runs a 3D grid
(B*H, L_q/bq, L_k/bk) with the K axis innermost; running max / denominator /
accumulator live in VMEM scratch and persist across the sequential K steps.

Falls back to the XLA path (in nn/attention.py) whenever shapes are too
small or unaligned to be worth it — see `flash_attention_supported`.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default block sizes. Measured on v5e at the TBSRN shape (B*H=2048,
# L=1024, Dh=32): full-K 1024x1024 blocks run ~40% faster than the XLA
# softmax-attention path (15.2 vs 25.1 ms) and ~25% faster than 512-blocks;
# they are clamped to the actual sequence length per call.
_BQ = 1024
_BK = 1024


def flash_attention_supported(q_shape: Tuple[int, ...]) -> bool:
    """Worth dispatching to the Pallas kernel? (alignment + size gate)."""
    if len(q_shape) != 4:
        return False
    _, _, l, d = q_shape
    return l >= 512 and l % 256 == 0 and d in (32, 64, 128, 256)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk)

    m_prev = m_ref[:]                                   # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)          # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                              # (bq, bk)
    correction = jnp.exp(m_prev - m_new)                # (bq, 1)
    l_ref[:] = l_ref[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _full_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, g):
    """Full-K attention for G (batch*head) pairs per program — no online
    softmax needed when the whole K/V row fits VMEM; looping G pairs in one
    program amortizes per-program dispatch/DMA overhead.

    The softmax normalisation is DEFERRED past the PV matmul: dividing the
    (L, Dh) output by the row sums costs L*Dh VPU ops instead of L*L —
    measured ~6% faster at the TBSRN shape (the kernel is VPU-bound on
    exp)."""
    for i in range(g):
        q = q_ref[i]
        s = jax.lax.dot_general(
            q, k_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = (o / denom).astype(o_ref.dtype)


def _attn_cost(bh: int, lq: int, lk: int, d: int,
               n_matmuls: int = 2) -> "pl.CostEstimate":
    """Analytic cost for XLA's scheduler AND for honest MFU numbers:
    .compile().cost_analysis() counts zero flops inside custom calls
    unless the kernel declares them, which made the attention-heavy
    benches report absurdly low MFU."""
    return pl.CostEstimate(
        flops=n_matmuls * 2 * bh * lq * lk * d,
        transcendentals=bh * lq * lk,  # exp
        bytes_accessed=2 * bh * (lq + 2 * lk) * d * 2,
    )


@functools.partial(jax.jit, static_argnames=("scale", "group"))
def _mha_full(q3, k3, v3, scale: float, group: int):
    bh, lq, d = q3.shape
    lk = k3.shape[1]
    return pl.pallas_call(
        functools.partial(_full_kernel, scale=scale, g=group),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q3.dtype),
        cost_estimate=_attn_cost(bh, lq, lk, d),
        grid=(bh // group,),
        in_specs=[
            pl.BlockSpec((group, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, lk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, lk, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, lq, d), lambda i: (i, 0, 0)),
        interpret=jax.default_backend() == "cpu",
    )(q3, k3, v3)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    """Per-head attention over lane-packed (L, H*Dh) blocks.

    Taking q/k/v in their NATIVE (B, L, H*Dh) layout (lanes = 128 for the
    TBSRN enhancer) avoids the (B, H, L, Dh) transpose entirely: with
    Dh=32 that transpose forces XLA layout copies of 4x-lane-padded
    buffers around the custom call — measured ~11.5 ms/step of pure copies
    in the TBSRN forward trace. Head slices are static lane offsets."""
    dh = q_ref.shape[-1] // heads
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def flash_mha_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                     heads: int) -> jax.Array:
    """Multi-head attention over (B, L, H*Dh) packed inputs -> same shape."""
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // heads
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=1.0 / math.sqrt(dh),
                          heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        cost_estimate=_attn_cost(b * heads, lq, lk, dh),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0)),
        # gate allows L up to 2048: the (L, L) fp32 score/prob temporaries
        # then exceed the compiler's default 16M scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)


def flash_packed_supported(lq: int, lk: int, d: int, heads: int) -> bool:
    return (lq == lk and 512 <= lq <= 2048 and lq % 256 == 0
            and d % heads == 0 and d <= 512 and (d // heads) % 8 == 0)


def _qkv_kernel(x_ref, o_ref, *, scale, heads):
    """Self-attention straight off the FUSED (L, 3D) qkv buffer: q/k/v are
    static lane slices, so the (B,L,3D) -> 3x(B,L,D) split copy that fed
    `_packed_kernel` (profiled ~1.2 ms x5 SRBs per TBSRN batch-512 step)
    never materialises."""
    d = o_ref.shape[-1]
    dh = d // heads
    x = x_ref[0]
    for h in range(heads):
        q = x[:, h * dh:(h + 1) * dh]
        k = x[:, d + h * dh:d + (h + 1) * dh]
        v = x[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * dh:(h + 1) * dh] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def flash_mha_qkv_packed(qkv: jax.Array, heads: int) -> jax.Array:
    """Attention over the fused [q|k|v] (B, L, 3D) projection -> (B, L, D)."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    return pl.pallas_call(
        functools.partial(_qkv_kernel, scale=1.0 / math.sqrt(dh),
                          heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        cost_estimate=_attn_cost(b * heads, l, l, dh),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, l, d3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0)),
        # see flash_mha_packed: L=2048 temporaries exceed the 16M default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(qkv)


# ---------------------------------------------------------------------------
# Packed attention WITH dropout on the softmax probabilities.
#
# Train-mode attention was the TBSRN train step's dominant cost: the XLA
# fallback materialises the (B, H, L, L) fp32 probabilities to HBM, threefry-
# generates an equally-large dropout mask, and saves both for the backward
# (profiled 2026-08-16: ~255 of 365 ms/step across the 5 SRBs at B=128,
# L=1024). Here the mask is a counter-based hash evaluated INSIDE the kernel
# from (seed, batch, head, q, k) — nothing touches HBM, and the backward
# kernel regenerates bit-identical keep decisions from the same seed, so no
# residuals are stored beyond q/k/v. (pltpu.prng_random_bits has no interpret-
# mode lowering in this jax, so the hash keeps CPU tests runnable; a murmur3
# finalizer is plenty for dropout.)
# ---------------------------------------------------------------------------


def _fmix(x):
    """murmur3 fmix32: decorrelates sequential counters (wraps mod 2^32)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _bh_seed(seed, b, h: int, heads: int):
    """Per-(batch, head) seed: hashing (rather than a linear l*l-strided
    counter offset) keeps masks decorrelated even when B*H*L^2 exceeds
    2^32 — a plain offset would alias bit-identical masks across (b, h)
    pairs at e.g. L=2048, B*H >= 1024."""
    bh = b.astype(jnp.uint32) * jnp.uint32(heads) + jnp.uint32(h)
    return _fmix(seed ^ (bh * jnp.uint32(0x9E3779B9)))


def _keep_mask(seed_bh, row0: int, rows: int, cols: int, thresh):
    """Deterministic (rows, cols) keep mask from a per-(batch, head) seed
    (`_bh_seed`) and a static row offset. Identical arithmetic runs in the
    fwd kernel, the bwd kernel, and the pure-jnp test oracle, so dropout
    decisions agree bit-for-bit."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0).astype(jnp.uint32)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1).astype(jnp.uint32)
    x = _fmix(((r + jnp.uint32(row0)) * jnp.uint32(cols) + c) ^ seed_bh)
    return x < thresh


def _thresh(rate: float) -> jnp.uint32:
    return jnp.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1))


def _packed_dropout_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                               scale, heads, rate, cq):
    l, d = q_ref.shape[1], q_ref.shape[2]
    dh = d // heads
    pid = pl.program_id(0)
    seed = seed_ref[0]
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        seed_bh = _bh_seed(seed, pid, h, heads)
        kh = k[:, sl]
        vh = v[:, sl]
        for c0 in range(0, l, cq):
            s = jax.lax.dot_general(
                q[c0:c0 + cq, sl], kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            keep = _keep_mask(seed_bh, c0, cq, l, thresh)
            p = jnp.where(keep, p, 0.0)
            o = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, c0:c0 + cq, sl] = (o * (inv_keep / denom)).astype(
                o_ref.dtype)


def _packed_dropout_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                               dq_ref, dk_ref, dv_ref, *,
                               scale, heads, rate, cq):
    l, d = q_ref.shape[1], q_ref.shape[2]
    dh = d // heads
    pid = pl.program_id(0)
    seed = seed_ref[0]
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        seed_bh = _bh_seed(seed, pid, h, heads)
        kh = k[:, sl].astype(jnp.float32)
        vh = v[:, sl].astype(jnp.float32)
        dk_acc = jnp.zeros((l, dh), jnp.float32)
        dv_acc = jnp.zeros((l, dh), jnp.float32)
        for c0 in range(0, l, cq):
            qc = q[c0:c0 + cq, sl].astype(jnp.float32)
            doc = do[c0:c0 + cq, sl].astype(jnp.float32)
            s = jax.lax.dot_general(
                qc, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)   # true softmax
            keep = _keep_mask(seed_bh, c0, cq, l, thresh)
            dropped = jnp.where(keep, probs, 0.0) * inv_keep
            dv_acc = dv_acc + jax.lax.dot_general(
                dropped, doc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_dropped = jax.lax.dot_general(
                doc, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jnp.where(keep, d_dropped, 0.0) * inv_keep
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            dq_ref[0, c0:c0 + cq, sl] = (jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            ).astype(dq_ref.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, qc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        dk_ref[0, :, sl] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "rate"))
def _packed_dropout_fwd(q, k, v, seed, heads: int, rate: float):
    b, lq, d = q.shape
    dh = d // heads
    cq = 512 if lq % 512 == 0 else 256  # gate only guarantees lq % 256
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    return pl.pallas_call(
        functools.partial(_packed_dropout_fwd_kernel,
                          scale=1.0 / math.sqrt(dh), heads=heads, rate=rate,
                          cq=cq),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        cost_estimate=_attn_cost(b * heads, lq, lq, dh),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0)),
        # the unrolled head x chunk loop + hash temporaries overflow the
        # compiler's default 16M scoped-vmem budget; v5e has far more
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(seed_arr, q, k, v)


@functools.partial(jax.jit, static_argnames=("heads", "rate"))
def _packed_dropout_bwd(q, k, v, do, seed, heads: int, rate: float):
    b, lq, d = q.shape
    dh = d // heads
    cq = 512 if lq % 512 == 0 else 256  # gate only guarantees lq % 256
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    spec = pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_packed_dropout_bwd_kernel,
                          scale=1.0 / math.sqrt(dh), heads=heads, rate=rate,
                          cq=cq),
        out_shape=[jax.ShapeDtypeStruct((b, lq, d), q.dtype)] * 3,
        cost_estimate=_attn_cost(b * heads, lq, lq, dh, n_matmuls=5),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(seed_arr, q, k, v, do)


def _qkv_dropout_fwd_kernel(seed_ref, x_ref, o_ref, *, scale, heads, rate,
                            cq):
    d = o_ref.shape[-1]
    l = o_ref.shape[1]
    dh = d // heads
    pid = pl.program_id(0)
    seed = seed_ref[0]
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate)
    x = x_ref[0]
    for h in range(heads):
        seed_bh = _bh_seed(seed, pid, h, heads)
        kh = x[:, d + h * dh:d + (h + 1) * dh]
        vh = x[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
        for c0 in range(0, l, cq):
            s = jax.lax.dot_general(
                x[c0:c0 + cq, h * dh:(h + 1) * dh], kh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            keep = _keep_mask(seed_bh, c0, cq, l, thresh)
            p = jnp.where(keep, p, 0.0)
            o = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, c0:c0 + cq, h * dh:(h + 1) * dh] = (
                o * (inv_keep / denom)).astype(o_ref.dtype)


def _qkv_dropout_bwd_kernel(seed_ref, x_ref, do_ref, dx_ref, *,
                            scale, heads, rate, cq):
    d = do_ref.shape[-1]
    l = do_ref.shape[1]
    dh = d // heads
    pid = pl.program_id(0)
    seed = seed_ref[0]
    thresh = _thresh(rate)
    inv_keep = 1.0 / (1.0 - rate)
    x = x_ref[0]
    do = do_ref[0]
    for h in range(heads):
        qs = slice(h * dh, (h + 1) * dh)
        ks = slice(d + h * dh, d + (h + 1) * dh)
        vs = slice(2 * d + h * dh, 2 * d + (h + 1) * dh)
        seed_bh = _bh_seed(seed, pid, h, heads)
        kh = x[:, ks].astype(jnp.float32)
        vh = x[:, vs].astype(jnp.float32)
        dk_acc = jnp.zeros((l, dh), jnp.float32)
        dv_acc = jnp.zeros((l, dh), jnp.float32)
        for c0 in range(0, l, cq):
            qc = x[c0:c0 + cq, qs].astype(jnp.float32)
            doc = do[c0:c0 + cq, qs].astype(jnp.float32)
            s = jax.lax.dot_general(
                qc, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            keep = _keep_mask(seed_bh, c0, cq, l, thresh)
            dropped = jnp.where(keep, probs, 0.0) * inv_keep
            dv_acc = dv_acc + jax.lax.dot_general(
                dropped, doc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_dropped = jax.lax.dot_general(
                doc, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jnp.where(keep, d_dropped, 0.0) * inv_keep
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            dx_ref[0, c0:c0 + cq, qs] = (jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            ).astype(dx_ref.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, qc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        dx_ref[0, :, ks] = dk_acc.astype(dx_ref.dtype)
        dx_ref[0, :, vs] = dv_acc.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "rate"))
def _qkv_dropout_fwd(qkv, seed, heads: int, rate: float):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    cq = 512 if l % 512 == 0 else 256  # gate only guarantees l % 256
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    return pl.pallas_call(
        functools.partial(_qkv_dropout_fwd_kernel,
                          scale=1.0 / math.sqrt(dh), heads=heads, rate=rate,
                          cq=cq),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        cost_estimate=_attn_cost(b * heads, l, l, dh),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, l, d3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(seed_arr, qkv)


@functools.partial(jax.jit, static_argnames=("heads", "rate"))
def _qkv_dropout_bwd(qkv, do, seed, heads: int, rate: float):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    cq = 512 if l % 512 == 0 else 256  # gate only guarantees l % 256
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    return pl.pallas_call(
        functools.partial(_qkv_dropout_bwd_kernel,
                          scale=1.0 / math.sqrt(dh), heads=heads, rate=rate,
                          cq=cq),
        out_shape=jax.ShapeDtypeStruct((b, l, d3), qkv.dtype),
        cost_estimate=_attn_cost(b * heads, l, l, dh, n_matmuls=5),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, l, d3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, l, d), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, l, d3), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(seed_arr, qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def flash_mha_qkv_packed_dropout(qkv: jax.Array, seed: jax.Array,
                                 heads: int, rate: float) -> jax.Array:
    """Dropout attention over the fused [q|k|v] (B, L, 3D) buffer. Same
    math as `flash_mha_packed_dropout`, but the gradient comes back as ONE
    fused (B, L, 3D) buffer — the qkv Dense's VJP consumes it directly, so
    neither the forward split nor the backward concat ever materialises."""
    return _qkv_dropout_fwd(qkv, seed, heads, rate)


def _qkv_dropout_vjp_fwd(qkv, seed, heads, rate):
    return _qkv_dropout_fwd(qkv, seed, heads, rate), (qkv, seed)


def _qkv_dropout_vjp_bwd(heads, rate, res, do):
    qkv, seed = res
    dqkv = _qkv_dropout_bwd(qkv, do, seed, heads, rate)
    return dqkv, np.zeros(jnp.shape(seed), jax.dtypes.float0)


flash_mha_qkv_packed_dropout.defvjp(_qkv_dropout_vjp_fwd,
                                    _qkv_dropout_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_mha_packed_dropout(q: jax.Array, k: jax.Array, v: jax.Array,
                             seed: jax.Array, heads: int,
                             rate: float) -> jax.Array:
    """softmax(q k^T / sqrt(dh)) with dropout(rate) on the probabilities,
    over lane-packed (B, L, H*Dh) inputs — the train-mode counterpart of
    `flash_mha_packed`. `seed` is a uint32 scalar (fold the step rng into
    it); the same seed reproduces the same mask, which is how the backward
    pass recomputes the dropout decisions instead of storing an
    O(B·H·L²) mask."""
    return _packed_dropout_fwd(q, k, v, seed, heads, rate)


def _packed_dropout_vjp_fwd(q, k, v, seed, heads, rate):
    return _packed_dropout_fwd(q, k, v, seed, heads, rate), (q, k, v, seed)


def _packed_dropout_vjp_bwd(heads, rate, res, do):
    q, k, v, seed = res
    dq, dk, dv = _packed_dropout_bwd(q, k, v, do, seed, heads, rate)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dq, dk, dv, dseed


flash_mha_packed_dropout.defvjp(_packed_dropout_vjp_fwd,
                                _packed_dropout_vjp_bwd)


def dropout_keep_oracle(b: int, heads: int, l: int, seed,
                        rate: float) -> jax.Array:
    """Pure-jnp reference of the kernel's keep mask, (B, H, L, L) bool —
    test-only, mirrors `_keep_mask` exactly."""
    seed = jnp.asarray(seed, jnp.uint32)
    thresh = _thresh(rate)
    masks = []
    for bi in range(b):
        row = []
        for h in range(heads):
            seed_bh = _bh_seed(seed, jnp.uint32(bi), h, heads)
            row.append(_keep_mask(seed_bh, 0, l, l, thresh))
        masks.append(jnp.stack(row))
    return jnp.stack(masks)


@jax.custom_vjp
def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Unmasked softmax(q k^T / sqrt(d)) v over (B, H, L, Dh) inputs.

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes the attention probabilities through plain XLA einsums (the
    standard recompute-in-bwd trick — O(Lq x Lkv) transient, fine for the
    sr-reduced K/V shapes this is dispatched on)."""
    return _flash_mha_impl(q, k, v)


def _flash_vjp_fwd(q, k, v):
    return _flash_mha_impl(q, k, v), (q, k, v)


def _flash_vjp_bwd(res, do):
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_mha.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_mha_impl(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = _BQ, block_k: int = _BK) -> jax.Array:
    interpret = jax.default_backend() == "cpu"  # tests run on CPU
    b, h, lq, d = q.shape
    lk = k.shape[2]

    # small-sequence fast path: whole rows fit VMEM; group BH pairs per
    # program (see _full_kernel)
    if lk <= 1024 and lq <= 1024 and d <= 64:
        bh = b * h
        # G=2 is the VMEM-safe sweet spot with deferred normalisation
        for group in (2, 1):
            if bh % group == 0:
                break
        out = _mha_full(q.reshape(bh, lq, d), k.reshape(bh, lk, d),
                        v.reshape(bh, lk, d), 1.0 / math.sqrt(d), group)
        return out.reshape(b, h, lq, d)

    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    scale = 1.0 / math.sqrt(d)

    bh = b * h
    q3 = q.reshape(bh, lq, d)
    k3 = k.reshape(bh, lk, d)
    v3 = v.reshape(bh, lk, d)

    grid = (bh, lq // block_q, pl.cdiv(lk, block_k))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        cost_estimate=_attn_cost(bh, lq, lk, d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, lq, d)
