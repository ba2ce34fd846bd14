"""The whole TBSRN FeatureEnhancer block as ONE Pallas TPU kernel.

The enhancer (scene-text-telescope/model/tbsrn.py:63-92: MHA(h=4, d=128)
-> LN -> FFN(128) -> LN -> proj back to 64) is the flagship's hot loop —
5 of them run per forward, and at the TBSRN shape every sublayer's
(L=1024, 128) intermediate is small enough that the XLA lowering is
bandwidth/overhead-bound, not FLOP-bound: qkv matmul, attention kernel,
out-projection, fused-LN kernel, two FFN matmuls, second LN and the
64-d projection each round-trip their operands through HBM (~5.5 MB per
enhancer-image against ~0.4 MB of essential traffic). This kernel keeps
the entire block in VMEM: x is read once, the 64-d output written once,
and every intermediate (fused qkv, per-head attention with deferred
softmax normalisation as in ops/flash_attention.py, both torch-semantics
LayerNorms from ops/fused_layernorm.py's formula, the FFN) lives in
registers/VMEM scratch. fp32 accumulation everywhere; activations round
to the input dtype at the same points the unfused module path does.

Inference-only (no dropout, no custom VJP): the training path keeps the
composable kernels whose in-kernel-dropout backward already exists.
Numerical parity with the unfused FeatureEnhancer path is tested in
tests/test_fused_enhancer.py (exact formula match in fp32; bf16 smoke).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_enhancer_supported(l: int, d_model: int, heads: int) -> bool:
    """Same alignment envelope as the packed attention kernels."""
    return (512 <= l <= 2048 and l % 256 == 0 and d_model % 128 == 0
            and d_model <= 256 and d_model % heads == 0
            and (d_model // heads) % 8 == 0)


def _ln(v32, scale_ref, bias_ref, eps: float):
    """torch-semantics LayerNorm on fp32: (v - mean) / (unbiased_std + eps)
    — one formula with ops/fused_layernorm.py::_ref_ln."""
    n = v32.shape[-1]
    mean = jnp.mean(v32, axis=-1, keepdims=True)
    d = v32 - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) / max(n - 1, 1)
    return (d / (jnp.sqrt(var) + eps) * scale_ref[...].astype(jnp.float32)
            + bias_ref[...].astype(jnp.float32))


def _dense(x, w_ref, b_ref, dtype):
    """nn.Dense semantics at compute dtype `dtype`, fp32 accumulation."""
    y = jax.lax.dot_general(
        x.astype(dtype), w_ref[...].astype(dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return y + b_ref[...].astype(jnp.float32)


def _enhancer_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                     s1_ref, b1_ref, w1_ref, bf1_ref, w2_ref, bf2_ref,
                     s2_ref, b2_ref, wp_ref, bp_ref, o_ref, attn_ref, *,
                     heads: int, eps: float):
    dt = x_ref.dtype
    x = x_ref[0]                                   # (L, D)
    d = x.shape[-1]
    dh = d // heads
    scale = 1.0 / math.sqrt(dh)

    qkv = _dense(x, wqkv_ref, bqkv_ref, dt).astype(dt)   # (L, 3D)
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, d + h * dh:d + (h + 1) * dh]
        v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_ref[:, h * dh:(h + 1) * dh] = (o / denom).astype(dt)

    out = _dense(attn_ref[...], wout_ref, bout_ref, dt).astype(dt)
    x1 = _ln(x.astype(jnp.float32) + out.astype(jnp.float32),
             s1_ref, b1_ref, eps).astype(dt)       # LN1(x + attn_out)

    y = jnp.maximum(_dense(x1, w1_ref, bf1_ref, dt), 0.0).astype(dt)
    y2 = _dense(y, w2_ref, bf2_ref, dt).astype(dt)
    x2 = _ln(x1.astype(jnp.float32) + y2.astype(jnp.float32),
             s2_ref, b2_ref, eps).astype(dt)       # LN2(x1 + ffn)

    o_ref[0] = _dense(x2, wp_ref, bp_ref, dt).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "eps"))
def fused_enhancer(x: jax.Array, params: dict, heads: int = 4,
                   eps: float = 1e-6) -> jax.Array:
    """Run the full enhancer block on (B, L, D) tokens-with-PE.

    `params` is the FeatureEnhancer param subtree (mha/qkv, mha/out, ln1,
    pff_w1, pff_w2, ln2, proj as created by the flax module). Returns the
    (B, L, C_out) projection output (C_out = proj kernel's fan-out)."""
    b, l, d = x.shape
    c_out = params["proj"]["kernel"].shape[-1]
    weights = [
        params["mha"]["qkv"]["kernel"], params["mha"]["qkv"]["bias"],
        params["mha"]["out"]["kernel"], params["mha"]["out"]["bias"],
        params["ln1"]["scale"], params["ln1"]["bias"],
        params["pff_w1"]["kernel"], params["pff_w1"]["bias"],
        params["pff_w2"]["kernel"], params["pff_w2"]["bias"],
        params["ln2"]["scale"], params["ln2"]["bias"],
        params["proj"]["kernel"], params["proj"]["bias"],
    ]
    # 1-D biases/scales become (1, n) rows (lane layout; broadcast in-kernel)
    weights = [w if w.ndim == 2 else w.reshape(1, -1) for w in weights]
    operands = (x, *weights)
    shared = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in weights]
    dh = d // heads
    flops = 2 * b * l * (d * 3 * d                      # qkv
                         + heads * 2 * l * dh           # scores + pv
                         + d * d                        # out proj
                         + 2 * d * d                    # ffn
                         + d * c_out)                   # final proj
    return pl.pallas_call(
        functools.partial(_enhancer_kernel, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, l, c_out), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, l, d), lambda i: (i, 0, 0))] + shared,
        out_specs=pl.BlockSpec((1, l, c_out), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((l, d), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            transcendentals=b * heads * l * l + 4 * b * l,  # exp + LN rsqrt
            bytes_accessed=b * l * (d + c_out) * jnp.dtype(x.dtype).itemsize,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
