"""Round-4 on-chip A/B probes #2: softmax-stabilization cost in the
fused-enhancer kernel.

The shipped kernel (ops/fused_enhancer.py) is MXU-output-bound on the
(L, L) score/PV matmuls (structural floor ~12 us/image/enhancer at the
TBSRN shape) but measures ~18 us — the gap is VPU passes over the 4x
(1024, 1024) fp32 scores: the per-row max reduce and the exp2. Softmax
is shift-invariant for ANY shift m (exact math, not an approximation),
so the max only serves fp-range safety; these variants cheapen it:

  base      : shipped kernel (fp32 per-row max + fp32 exp2)
  bf16max   : per-row max computed on the scores cast to bf16 (half the
              reduce traffic); subtraction still fp32. m is within 0.4%
              of the true max -> exp2 stays in range; results differ only
              by fp rounding of (s - m).
  nomax     : no per-row reduce at all — m is a per-IMAGE scalar safety
              bound (max over a bf16 copy of the whole score block).
  bf16exp   : per-row fp32 max, but exp2 evaluated on bf16 (s - m)
              (p is cast to bf16 right after exp2 anyway).
  imgs2     : base math, 2 images per grid step (overhead amortization).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_enhancer_r5.py
Prints mean-abs deviation vs the shipped kernel + ms/call per variant.
"""

import functools
import math
import time

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fudanocr_tpu.models.sr.tbsrn import FeatureEnhancer
from fudanocr_tpu.ops.fused_enhancer import fused_enhancer, _ln, _dense

B, H, W, C = 512, 16, 64, 64
L, D, HEADS = H * W, 128, 4
ITERS = 20


def _kernel(t_ref, pe_ref, peqkv_ref, wtop_ref, wout_ref, bout_ref,
            s1_ref, b1_ref, w1_ref, bf1_ref, w2_ref, bf2_ref,
            s2_ref, b2_ref, wp_ref, bp_ref, o_ref, attn_ref, *,
            heads: int, eps: float, imgs: int, mode: str):
    dt = t_ref.dtype
    pe = pe_ref[...]
    for img in range(imgs):
        t = t_ref[img]
        x = jnp.concatenate([t, pe], axis=-1)
        d = x.shape[-1]
        dh = d // heads
        scale = math.log2(math.e) / math.sqrt(dh)

        qkv32 = jax.lax.dot_general(
            t, wtop_ref[...].astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + peqkv_ref[...]
        qkv = jnp.concatenate(
            [qkv32[:, :d] * scale, qkv32[:, d:]], axis=-1).astype(dt)
        one_col = jnp.ones((x.shape[0], 1), dt)
        for h in range(heads):
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, d + h * dh:d + (h + 1) * dh]
            v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mode == "bf16max":
                m = jnp.max(s.astype(jnp.bfloat16), axis=-1,
                            keepdims=True).astype(jnp.float32)
                p = jnp.exp2(s - m).astype(dt)
            elif mode == "nomax":
                # timing ceiling for removing the reduce entirely: a
                # compile-time shift (valid whenever scores stay < ~120)
                p = jnp.exp2(s).astype(dt)
            elif mode == "bf16exp":
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2((s - m).astype(dt))
            else:  # base math
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m).astype(dt)
            vext = jnp.concatenate([v, one_col], axis=-1)
            oext = jax.lax.dot_general(
                p, vext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            denom = oext[:, dh:dh + 1]
            attn_ref[:, h * dh:(h + 1) * dh] = (
                oext[:, :dh] / denom).astype(dt)

        out = _dense(attn_ref[...], wout_ref, bout_ref, dt).astype(dt)
        x1 = _ln(x.astype(jnp.float32) + out.astype(jnp.float32),
                 s1_ref, b1_ref, eps).astype(dt)
        y = jnp.maximum(_dense(x1, w1_ref, bf1_ref, dt), 0.0).astype(dt)
        y2 = _dense(y, w2_ref, bf2_ref, dt).astype(dt)
        x2 = _ln(x1.astype(jnp.float32) + y2.astype(jnp.float32),
                 s2_ref, b2_ref, eps).astype(dt)
        o_ref[img] = _dense(x2, wp_ref, bp_ref, dt).astype(o_ref.dtype)


def fused_v(tokens, pe, params, heads=4, eps=1e-6, imgs=1, mode="base"):
    b, l, c = tokens.shape
    d = c + pe.shape[-1]
    c_out = params["proj"]["kernel"].shape[-1]
    dt = tokens.dtype
    wqkv = params["mha"]["qkv"]["kernel"]
    peqkv = jax.lax.dot_general(
        pe.astype(dt), wqkv[c:].astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    ) + params["mha"]["qkv"]["bias"].astype(jnp.float32)
    weights = [
        wqkv[:c],
        params["mha"]["out"]["kernel"], params["mha"]["out"]["bias"],
        params["ln1"]["scale"], params["ln1"]["bias"],
        params["pff_w1"]["kernel"], params["pff_w1"]["bias"],
        params["pff_w2"]["kernel"], params["pff_w2"]["bias"],
        params["ln2"]["scale"], params["ln2"]["bias"],
        params["proj"]["kernel"], params["proj"]["bias"],
    ]
    weights = [w if w.ndim == 2 else w.reshape(1, -1) for w in weights]
    shared_in = [pe, peqkv] + weights
    shared = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in shared_in]
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, eps=eps, imgs=imgs,
                          mode=mode),
        out_shape=jax.ShapeDtypeStruct((b, l, c_out), dt),
        grid=(b // imgs,),
        in_specs=[pl.BlockSpec((imgs, l, c), lambda i: (i, 0, 0))] + shared,
        out_specs=pl.BlockSpec((imgs, l, c_out), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((l, d), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tokens, *shared_in)


def time_variant(name, fn, params, pe, x0):
    def chain(params, x):
        def body(x, _):
            y = fn(x, pe, params)
            return y, y[0, 0, 0].astype(jnp.float32)
        _, last = jax.lax.scan(body, x, None, length=ITERS)
        return last

    compiled = jax.jit(chain).lower(params, x0).compile()
    float(compiled(params, x0)[-1])  # warm
    t0 = time.perf_counter()
    float(compiled(params, x0)[-1])
    dt = time.perf_counter() - t0
    print(f"{name:12s} {dt / ITERS * 1e3:8.3f} ms/call "
          f"{B * ITERS / dt:9.1f} img/s", flush=True)
    return dt / ITERS


def main():
    mod = FeatureEnhancer(height=H, width=W, dtype=jnp.bfloat16)
    x0 = (jax.random.normal(jax.random.PRNGKey(0), (B, L, C), jnp.float32)
          * 0.5).astype(jnp.bfloat16)
    v = jax.jit(mod.init)(jax.random.PRNGKey(1), x0)
    params = v["params"]
    from fudanocr_tpu.nn.attention import positional_encoding_2d
    pe = jnp.asarray(
        positional_encoding_2d(64, H, W).reshape(64, L).T, jnp.bfloat16)

    want = np.asarray(fused_enhancer(x0[:8], pe, params, heads=HEADS),
                      np.float32)
    for mode in ("bf16max", "nomax", "bf16exp"):
        got = np.asarray(fused_v(x0[:8], pe, params, mode=mode), np.float32)
        print(f"mean|{mode}-base| = {np.mean(np.abs(got - want)):.3e} "
              f"(scale {np.mean(np.abs(want)):.3e})", flush=True)

    time_variant("base", lambda x, pe, p: fused_enhancer(x, pe, p, heads=4),
                 params, pe, x0)
    for mode in ("bf16max", "nomax", "bf16exp"):
        time_variant(mode, lambda x, pe, p, m=mode: fused_v(x, pe, p, mode=m),
                     params, pe, x0)
    time_variant("imgs2", lambda x, pe, p: fused_v(x, pe, p, imgs=2),
                 params, pe, x0)
    time_variant("nomax+imgs2",
                 lambda x, pe, p: fused_v(x, pe, p, imgs=2, mode="nomax"),
                 params, pe, x0)
    time_variant("bf16max+imgs2",
                 lambda x, pe, p: fused_v(x, pe, p, imgs=2, mode="bf16max"),
                 params, pe, x0)


if __name__ == "__main__":
    main()
