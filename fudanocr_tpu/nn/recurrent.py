"""Recurrent layers as `lax.scan`, built for the MXU.

The reference leans on cuDNN GRU/LSTM: the SR nets' GruBlock scans a
bidirectional GRU along one spatial axis with the other folded into batch
(scene-text-telescope/model/tsrn.py:128-145), and CRNN stacks two BiLSTMs
(model/crnn/crnn.py:6-22). On TPU we:

* hoist the input projection of ALL timesteps into one big (B*T, In)x(In, 3H)
  matmul before the scan (MXU-friendly; the scan body only does the small
  hidden-to-hidden matmul + elementwise gates);
* express bidirectionality as two scans over the same hoisted projections
  (the backward pass flips the time axis);
* keep gate math in fp32 regardless of compute dtype (cuDNN does too).

Gate ordering and update equations match torch so converted checkpoints
reproduce: GRU gates [r, z, n] with h' = (1-z)*n + z*h; LSTM gates
[i, f, g, o] with c' = f*c + i*g, h' = o*tanh(c').
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def _gru_scan(xproj: jax.Array, wh: jax.Array, bh: jax.Array,
              reverse: bool = False) -> jax.Array:
    """Scan a GRU over (B, T, 3H) pre-projected inputs. Returns (B, T, H)."""
    hdim = wh.shape[0]
    b = xproj.shape[0]
    xs = jnp.swapaxes(xproj, 0, 1)  # (T, B, 3H)

    def step(h, x_t):
        gates_h = h @ wh + bh  # (B, 3H)
        xr, xz, xn = jnp.split(x_t, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((b, hdim), dtype=xproj.dtype)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def _lstm_scan(xproj: jax.Array, wh: jax.Array, bh: jax.Array,
               reverse: bool = False) -> jax.Array:
    hdim = wh.shape[0]
    b = xproj.shape[0]
    xs = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4H)

    def step(carry, x_t):
        h, c = carry
        gates = x_t + h @ wh + bh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((b, hdim), dtype=xproj.dtype)
    (_, _), ys = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


class BiGRU(nn.Module):
    """Bidirectional GRU over (B, T, In) -> (B, T, 2*hidden).

    With `fuse` on (inference on TPU, supported shape) both directions
    run as ONE Pallas kernel with the recurrence VMEM-resident
    (ops/fused_gru.py) instead of two lax.scans whose per-step tensors
    round-trip HBM. Same fp32 gate math either way; the kernel has no
    VJP, so differentiated paths (training) keep the scan."""

    hidden: int
    dtype: Optional[Dtype] = None
    fuse: Any = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fudanocr_tpu.ops.fused_gru import (fused_bigru,
                                                fused_gru_supported)

        indim = x.shape[-1]
        xf = x.astype(jnp.float32)
        projs, whs, bhs = [], [], []
        for direction in ("fwd", "bwd"):
            wi = self.param(f"wi_{direction}", nn.initializers.lecun_normal(),
                            (indim, 3 * self.hidden))
            bi = self.param(f"bi_{direction}", nn.initializers.zeros,
                            (3 * self.hidden,))
            whs.append(self.param(f"wh_{direction}",
                                  nn.initializers.orthogonal(column_axis=0),
                                  (self.hidden, 3 * self.hidden)))
            bhs.append(self.param(f"bh_{direction}", nn.initializers.zeros,
                                  (3 * self.hidden,)))
            projs.append(xf @ wi + bi)  # one big MXU matmul over all steps

        use_fused = bool(self.fuse) and (
            self.fuse == "force"
            or (jax.default_backend() != "cpu"
                and fused_gru_supported(x.shape[0], x.shape[1],
                                        self.hidden)))
        if use_fused:
            y = fused_bigru(projs[0], projs[1], whs[0], bhs[0],
                            whs[1], bhs[1], self.hidden)
        else:
            y = jnp.concatenate(
                [_gru_scan(projs[0], whs[0], bhs[0], reverse=False),
                 _gru_scan(projs[1], whs[1], bhs[1], reverse=True)],
                axis=-1)
        return y.astype(self.dtype or x.dtype)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over (B, T, In) -> (B, T, 2*hidden)."""

    hidden: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        indim = x.shape[-1]
        outs = []
        xf = x.astype(jnp.float32)
        for direction, reverse in (("fwd", False), ("bwd", True)):
            wi = self.param(f"wi_{direction}", nn.initializers.lecun_normal(),
                            (indim, 4 * self.hidden))
            bi = self.param(f"bi_{direction}", nn.initializers.zeros,
                            (4 * self.hidden,))
            wh = self.param(f"wh_{direction}",
                            nn.initializers.orthogonal(column_axis=0),
                            (self.hidden, 4 * self.hidden))
            bh = self.param(f"bh_{direction}", nn.initializers.zeros,
                            (4 * self.hidden,))
            xproj = xf @ wi + bi
            outs.append(_lstm_scan(xproj, wh, bh, reverse=reverse))
        y = jnp.concatenate(outs, axis=-1)
        return y.astype(self.dtype or x.dtype)


class SpatialGRU(nn.Module):
    """The SR nets' GruBlock: 1x1 conv then BiGRU along one spatial axis.

    Input (B, H, W, C); `axis` 'H' scans rows (W folded into batch), 'W'
    scans columns. Output channels == `features` (hidden = features // 2 per
    direction), matching tsrn.py:128-145.
    """

    features: int
    axis: str = "H"  # which spatial axis the recurrence runs along
    dtype: Optional[Dtype] = None
    fuse: Any = False  # Pallas BiGRU kernel (see BiGRU.fuse)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.features % 2 == 0
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv1")(x)
        b, h, w, c = x.shape
        if self.axis == "H":
            seq = x.transpose(0, 2, 1, 3).reshape(b * w, h, c)
        else:
            seq = x.reshape(b * h, w, c)
        y = BiGRU(self.features // 2, dtype=self.dtype, fuse=self.fuse,
                  name="gru")(seq)
        if self.axis == "H":
            y = y.reshape(b, w, h, self.features).transpose(0, 2, 1, 3)
        else:
            y = y.reshape(b, h, w, self.features)
        return y
