"""Multi-head attention and sinusoidal positional encodings.

TPU-first: QKV projections are three fused matmuls (MXU), scores computed in
fp32 via einsum; masks are additive -inf. The module can return the attention
probabilities because the reference's text-focus / stroke-focus losses train
on L1 between attention maps (scene-text-telescope/loss/text_focus_loss.py:95)
and the CTR decoders compress them into per-char spatial maps.

Positional encodings reproduce the reference's layouts:
  * 1D: loss/transformer.py:199-219 (interleaved sin/cos over d_model).
  * 2D: model/tbsrn.py:39-61 (first half encodes x/width, second half
    y/height, each interleaved sin/cos).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from fudanocr_tpu.ops.flash_attention import (flash_attention_supported,
                                              flash_mha,
                                              flash_mha_qkv_packed,
                                              flash_mha_qkv_packed_dropout,
                                              flash_packed_supported)

Dtype = Any


def positional_encoding_1d(d_model: int, length: int) -> np.ndarray:
    """[length, d_model] interleaved sin/cos encoding (host-side constant)."""
    pe = np.zeros((length, d_model), dtype=np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def positional_encoding_2d(d_model: int, height: int, width: int) -> np.ndarray:
    """[d_model, height, width]: first half sin/cos over width (x), second
    half over height (y)."""
    if d_model % 4 != 0:
        raise ValueError(f"2D PE needs d_model % 4 == 0, got {d_model}")
    pe = np.zeros((d_model, height, width), dtype=np.float32)
    half = d_model // 2
    div = np.exp(np.arange(0.0, half, 2, dtype=np.float32)
                 * -(math.log(10000.0) / half))
    pos_w = np.arange(width, dtype=np.float32)[:, None]
    pos_h = np.arange(height, dtype=np.float32)[:, None]
    pe[0:half:2, :, :] = np.sin(pos_w * div).T[:, None, :].repeat(height, 1)
    pe[1:half:2, :, :] = np.cos(pos_w * div).T[:, None, :].repeat(height, 1)
    pe[half::2, :, :] = np.sin(pos_h * div).T[:, :, None].repeat(width, 2)
    pe[half + 1::2, :, :] = np.cos(pos_h * div).T[:, :, None].repeat(width, 2)
    return pe


def subsequent_mask(size: int) -> np.ndarray:
    """[size, size] bool; True where attention is allowed (causal)."""
    return np.tril(np.ones((size, size), dtype=bool))


class MultiHeadAttention(nn.Module):
    """MHA over (B, L, D) with optional boolean mask and attention-map output.

    Matches the reference MHA (tbsrn.py:95-150): per-head scaled dot-product,
    output projection, no bias tricks. Dropout on attention probabilities is
    applied only when `deterministic=False`.
    """

    num_heads: int
    d_model: int
    dropout_rate: float = 0.1
    dtype: Optional[Dtype] = None
    use_flash: bool = False  # Pallas kernel path (no attention-map output)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        mask: Optional[jax.Array] = None,
        attention_map: Optional[jax.Array] = None,
        deterministic: bool = True,
        need_weights: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        h, d = self.num_heads, self.d_model
        dk = d // h
        b, lq = query.shape[0], query.shape[1]
        lk = key.shape[1]

        # fused projections: self-attention reads the token buffer ONCE
        # through a (D, 3D) matmul; cross-attention fuses k/v into (D, 2D).
        # (The reference runs four separate linears, tbsrn.py:116-119; the
        # checkpoint converter concatenates them to match.)
        if query is key and key is value:
            qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(query)
            if (self.use_flash and not need_weights and mask is None
                    and attention_map is None
                    and jax.default_backend() != "cpu"
                    and flash_packed_supported(lq, lk, d, h)):
                # lane-packed kernels consume the FUSED [q|k|v] projection
                # directly (static lane offsets per head): no (B,H,L,Dh)
                # transpose, no 3-way split copy, and the gradient returns
                # as one fused buffer the qkv Dense VJP consumes as-is
                if deterministic or self.dropout_rate == 0.0:
                    out = flash_mha_qkv_packed(qkv, h)
                else:
                    # train mode: dropout on the probs INSIDE the kernel —
                    # the XLA path materialises (B,H,L,L) fp32 probs + a
                    # threefry mask to HBM (the TBSRN train step's dominant
                    # cost, ~255 of 365 ms/step profiled across 5 SRBs)
                    seed = jax.random.bits(self.make_rng("dropout"), (),
                                           jnp.uint32)
                    out = flash_mha_qkv_packed_dropout(qkv, seed, h,
                                                       self.dropout_rate)
                out = nn.Dense(d, dtype=self.dtype, name="out")(out)
                return out, None
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(d, dtype=self.dtype, name="q")(query)
            if key is value:
                kv = nn.Dense(2 * d, dtype=self.dtype, name="kv")(key)
                k, v = jnp.split(kv, 2, axis=-1)
            else:
                k = nn.Dense(d, dtype=self.dtype, name="k")(key)
                v = nn.Dense(d, dtype=self.dtype, name="v")(value)
        q = q.reshape(b, lq, h, dk).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, dk).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, dk).transpose(0, 2, 1, 3)

        if attention_map is not None:
            probs = attention_map
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        elif (self.use_flash and not need_weights and mask is None
              and (deterministic or self.dropout_rate == 0.0)
              and jax.default_backend() != "cpu"  # interpret mode is slow;
              # the kernels are covered directly by tests/test_flash_attention
              and flash_attention_supported(q.shape)):
            out = flash_mha(q, k, v)
            probs = None
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            scores = scores / math.sqrt(dk)
            if mask is not None:
                # mask: broadcastable to (b, 1, lq, lk); True = keep
                scores = jnp.where(mask, scores, jnp.float32(-1e30))
            probs = jax.nn.softmax(scores, axis=-1)
            if self.dropout_rate > 0.0 and not deterministic:
                probs = nn.Dropout(self.dropout_rate)(
                    probs, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)

        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        out = nn.Dense(d, dtype=self.dtype, name="out")(out)
        if not need_weights:
            probs = None
        return out, probs
