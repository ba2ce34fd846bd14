"""Bidirectional GRU as a Pallas TPU kernel (TSRN/text-gestalt GruBlocks).

TSRN's SpatialGRU (the reference GruBlock, scene-text-telescope/model/
tsrn.py:123-145) runs a bidirectional GRU along one spatial axis with the
other folded into batch: at the TextZoom geometry that is (B*64, 16, C)
or (B*16, 64, C) sequences with hidden 32 per direction — 11 of them per
TSRN forward. The lax.scan path (nn/recurrent.py) already hoists the
input projection into one big matmul, but the scan body still round-trips
the (B', 3H) hidden-gate tensors through HBM every timestep, and the
tiny (B', H) state is re-read T times.

This kernel keeps the whole recurrence VMEM-resident: a (RB, T, 3H)
block of pre-projected inputs is read once, the (RB, H) state lives in
registers across the T-step in-kernel loop (static python unroll — T is
16/64 here), both directions run in one kernel writing fwd|bwd halves of
the (RB, T, 2H) output block, and HBM sees exactly one read of xproj and
one write of y. Gate math in fp32, identical formulas and ordering
[r, z, n] to nn/recurrent.py::_gru_scan so converted torch checkpoints
reproduce; parity is tested in tests/test_fused_gru.py.

Inference-only (the training path keeps the scan, whose VJP jax derives);
gated the same way as the other inference kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_gru_supported(rows: int, t: int, hidden: int) -> bool:
    """Row-blockable batch, modest static unroll, lane-tileable gates."""
    return (rows % 256 == 0 and 2 <= t <= 128 and hidden % 8 == 0
            and hidden <= 512)


def _row_block(rows: int, t_len: int, h3: int, itemsize: int) -> int:
    budget = 12 << 20  # per-direction xproj block bytes (VMEM headroom)
    for rb in (2048, 1024, 512, 256):
        if rows % rb == 0 and rb * t_len * h3 * itemsize <= budget:
            return rb
    return 256 if rows % 256 == 0 else rows


def _gru_kernel(xf_ref, xb_ref, whf_ref, bhf_ref, whb_ref, bhb_ref,
                o_ref, *, t_len: int, hidden: int):
    dt = xf_ref.dtype
    rb = xf_ref.shape[0]
    h3 = 3 * hidden

    def step(h32, x_t, wh_ref, bh_ref):
        """One GRU step: h (RB, H) fp32, x_t (RB, 3H) pre-projected."""
        gh = jax.lax.dot_general(
            h32.astype(dt), wh_ref[...].astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bh_ref[...]
        xr, xz, xn = (x_t[:, :hidden], x_t[:, hidden:2 * hidden],
                      x_t[:, 2 * hidden:])
        r = jax.nn.sigmoid(xr + gh[:, :hidden])
        z = jax.nn.sigmoid(xz + gh[:, hidden:2 * hidden])
        n = jnp.tanh(xn + r * gh[:, 2 * hidden:])
        return (1.0 - z) * n + z * h32

    hf = jnp.zeros((rb, hidden), jnp.float32)
    hb = jnp.zeros((rb, hidden), jnp.float32)
    for i in range(t_len):
        xf_t = xf_ref[:, i, :].astype(jnp.float32)
        xb_t = xb_ref[:, t_len - 1 - i, :].astype(jnp.float32)
        hf = step(hf, xf_t, whf_ref, bhf_ref)
        hb = step(hb, xb_t, whb_ref, bhb_ref)
        o_ref[:, i, :hidden] = hf.astype(dt)
        o_ref[:, t_len - 1 - i, hidden:] = hb.astype(dt)


@functools.partial(jax.jit, static_argnames=("hidden",))
def fused_bigru(xproj_f: jax.Array, xproj_b: jax.Array,
                wh_f: jax.Array, bh_f: jax.Array,
                wh_b: jax.Array, bh_b: jax.Array,
                hidden: int) -> jax.Array:
    """(B', T, 3H) fwd/bwd pre-projected inputs -> (B', T, 2H) outputs.

    xproj_* = x @ wi_* + bi_* (the hoisted input projections, computed
    outside as in nn/recurrent.py). wh_* are (H, 3H) hidden-to-hidden
    weights, bh_* their (3H,) biases."""
    rows, t_len, h3 = xproj_f.shape
    assert h3 == 3 * hidden
    dt = xproj_f.dtype
    rb = _row_block(rows, t_len, h3, jnp.dtype(dt).itemsize)
    shared = [wh_f, bh_f.reshape(1, -1), wh_b, bh_b.reshape(1, -1)]
    flops = rows * t_len * 2 * (2 * hidden * 3 * hidden + 10 * 3 * hidden)
    return pl.pallas_call(
        functools.partial(_gru_kernel, t_len=t_len, hidden=hidden),
        out_shape=jax.ShapeDtypeStruct((rows, t_len, 2 * hidden), dt),
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, t_len, h3), lambda i: (i, 0, 0)),
                  pl.BlockSpec((rb, t_len, h3), lambda i: (i, 0, 0))]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in shared],
        out_specs=pl.BlockSpec((rb, t_len, 2 * hidden), lambda i: (i, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            transcendentals=rows * t_len * 2 * 3 * hidden,
            bytes_accessed=(2 * rows * t_len * h3 + rows * t_len * 2 * hidden)
            * jnp.dtype(dt).itemsize,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xproj_f, xproj_b, *shared)
