"""Shared CTR core: ResNet encoder + 1-layer transformer decoder.

The reference forks this architecture five times with tiny deltas
(stroke-level-decomposition/model/transformer.py:320-377,
image-ids-CTR/model/transformer.py:329-389, orientation-independent-CTR/
model/transformer.py:399-450, character-profile-matching/model/
transformer.py:478-567, and scene-text-telescope/loss/transformer.py:348-389
as the frozen text-focus oracle). Here it exists once, parameterised:

* `num_in` / `layers` select the encoder (1-ch [1,2,5,3] for the SR loss
  oracle; 3-ch [3,4,6,3] for the CTR projects),
* `num_heads` selects decoder attention heads (16 for the loss oracle, 4
  for CTR),
* `out_dim` selects the generator (vocab logits, or an embedding dimension
  for CCR-CLIP's gallery-matching stage 2).

TPU-first: fixed-shape padded text with causal masking; the ragged
`probs_res` packing loop (transformer.py:364-371) is replaced by dense
(B, L, C) outputs consumed by masked losses; greedy decoding is a
`lax.fori_loop` over a static-length token buffer (see `greedy_decode`)
with the conv features encoded exactly once, matching the reference's
conv-cache eval loop (stroke-level-decomposition/train.py:110-121).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from fudanocr_tpu.nn.attention import (MultiHeadAttention,
                                       positional_encoding_1d,
                                       subsequent_mask)
from fudanocr_tpu.nn.layers import TorchLayerNorm, max_pool

Dtype = Any


class BasicBlock(nn.Module):
    """conv3-bn-relu-conv3-bn + (optionally downsampled) residual, relu."""

    features: int
    downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        r = x
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.downsample:
            r = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                        name="down_conv")(r)
            r = bn("down_bn")(r)
        return nn.relu(y + r)


class OCRResNet(nn.Module):
    """The CTR encoder family. Two reference variants share this code:

    * narrow 4-stage (SR loss oracle loss/transformer.py:82-168, SLD,
      ACPM): stages (256, 256, 512, 512) + a 1024 head conv; pools at the
      stem (+ before stage 0 for the oracle; SLD/ACPM comment theirs out);
    * wide 3-stage (OI-CTR transformer.py:125-199, image-ids-CTR
      transformer.py:80-152): stages (256, 512, 1024), each followed by a
      stage conv, NO head conv; pools before stages 0 and 1 (+ stage 2 for
      image-ids-CTR).

    `stage_pools[s]` pools before stage s; `stage_convs[s]` adds the
    conv+BN+ReLU after stage s; `head_conv` adds the final 1024 head."""

    num_in: int = 3
    layers: Sequence[int] = (3, 4, 6, 3)
    stage_feats: Sequence[int] = (256, 256, 512, 512)
    stage_pools: Sequence[bool] = (True, False, False, False)
    stage_convs: Sequence[bool] = (True, True, True, False)
    head_conv: bool = True
    # divide every channel width (smoke tests only — XLA:CPU runs the
    # reference's 1024-ch convs at ~0.2 GFLOP/s on the 1-core CI host, so
    # full-width app smokes cost ~30 s/step; default 1 = reference widths)
    width_div: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        w = lambda f: max(f // self.width_div, 4)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        x = nn.Conv(w(64), (3, 3), dtype=self.dtype, name="stem1_conv")(x)
        x = nn.relu(bn("stem1_bn")(x))
        x = max_pool(x, 2)
        x = nn.Conv(w(128), (3, 3), dtype=self.dtype, name="stem2_conv")(x)
        x = nn.relu(bn("stem2_bn")(x))

        in_feats = w(128)
        for s, (n_blocks, feats) in enumerate(zip(self.layers,
                                                  self.stage_feats)):
            feats = w(feats)
            if self.stage_pools[s]:
                x = max_pool(x, 2)
            for i in range(n_blocks):
                x = BasicBlock(feats, downsample=(i == 0 and in_feats != feats),
                               dtype=self.dtype, name=f"stage{s}_block{i}")(
                                   x, train)
            in_feats = feats
            if self.stage_convs[s]:
                x = nn.Conv(feats, (3, 3), dtype=self.dtype,
                            name=f"stage{s}_conv")(x)
                x = nn.relu(bn(f"stage{s}_bn")(x))
        if self.head_conv:
            x = nn.Conv(w(1024), (3, 3), dtype=self.dtype, name="head_conv")(x)
            x = nn.relu(bn("head_bn")(x))
        return x


# encoder presets per reference project
OCR_RESNET_PRESETS = {
    # loss oracle: stem + stage0 pool (loss/transformer.py:144)
    "oracle": dict(layers=(1, 2, 5, 3)),
    # SLD/ACPM: stem pool only (their layer1_pool is commented out)
    "sld": dict(layers=(3, 4, 6, 3),
                stage_pools=(False, False, False, False)),
    # OI-CTR: 3 wide stages, pools before stages 0,1, no head conv
    "oictr": dict(layers=(3, 4, 6), stage_feats=(256, 512, 1024),
                  stage_pools=(True, True, False),
                  stage_convs=(True, True, True), head_conv=False),
    # image-ids-CTR: like OI-CTR but also pools before stage 2
    "image_ids": dict(layers=(3, 4, 6), stage_feats=(256, 512, 1024),
                      stage_pools=(True, True, True),
                      stage_convs=(True, True, True), head_conv=False),
}


class OCRDecoderLayer(nn.Module):
    """Masked self-attn, cross-attn to conv tokens (returns the map), FFN —
    each with residual + the reference's std-based LayerNorm."""

    num_heads: int = 4
    d_model: int = 1024
    d_ff: int = 2048
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, text: jax.Array, memory: jax.Array,
                 self_mask: jax.Array, deterministic: bool = True,
                 attention_map: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, jax.Array]:
        sa, _ = MultiHeadAttention(self.num_heads, self.d_model,
                                   dtype=self.dtype, name="self_attn")(
            text, text, text, mask=self_mask, deterministic=deterministic,
            need_weights=False)
        x = TorchLayerNorm(name="ln1")(text, residual=sa)

        ca, attn_map = MultiHeadAttention(self.num_heads, self.d_model,
                                          dtype=self.dtype, name="cross_attn")(
            x, memory, memory, attention_map=attention_map,
            deterministic=deterministic)
        x = TorchLayerNorm(name="ln2")(x, residual=ca)

        y = nn.Dense(self.d_ff, dtype=self.dtype, name="pff_w1")(x)
        y = nn.relu(y)
        if not deterministic:
            y = nn.Dropout(0.1)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="pff_w2")(y)
        x = TorchLayerNorm(name="ln3")(x, residual=y)
        return x, attn_map


class OCRTransformer(nn.Module):
    vocab: int
    num_in: int = 3
    layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: int = 4
    d_embed: int = 512
    d_model: int = 1024
    d_ff: int = 2048
    max_len: int = 7000
    out_dim: Optional[int] = None  # None -> vocab logits
    stage1_pool: bool = True       # False for SLD/ACPM (2x downsample only)
    encoder_preset: Optional[str] = None  # key into OCR_RESNET_PRESETS
    encoder_width_div: int = 1     # smoke-test channel shrink (see OCRResNet)
    dtype: Optional[Dtype] = None

    def setup(self):
        if self.encoder_preset is not None:
            kw = dict(OCR_RESNET_PRESETS[self.encoder_preset])
        else:
            kw = dict(layers=self.layers)
            if not self.stage1_pool:
                kw["stage_pools"] = (False, False, False, False)
        self._encoder = OCRResNet(self.num_in, dtype=self.dtype,
                                  name="encoder",
                                  width_div=self.encoder_width_div, **kw)
        self._embed = nn.Embed(self.vocab, self.d_embed, dtype=self.dtype,
                               name="embed")
        self._decoder = OCRDecoderLayer(self.num_heads, self.d_model,
                                        self.d_ff, dtype=self.dtype,
                                        name="decoder")
        self._generator = nn.Dense(self.out_dim or self.vocab,
                                   dtype=self.dtype, name="generator")

    def encode(self, image: jax.Array, train: bool = False) -> jax.Array:
        """Image -> (B, Ht*Wt, d_model) memory tokens."""
        conv = self._encoder(image, train)
        b, h, w, c = conv.shape
        return conv.reshape(b, h * w, c)

    def decode_step(self, memory: jax.Array, text_input: jax.Array,
                    train: bool = False,
                    attention_map: Optional[jax.Array] = None,
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(B, L) token ids + memory -> (logits, attn_map, hidden)."""
        b, l = text_input.shape
        emb = self._embed(text_input) * math.sqrt(self.d_embed)
        pe = jnp.asarray(positional_encoding_1d(self.d_embed, l),
                         dtype=emb.dtype)
        # the reference CONCATs a pure positional vector to the embedding
        # (loss/transformer.py:369-370) instead of adding it
        x = jnp.concatenate([emb, jnp.broadcast_to(pe, (b, l, self.d_embed))],
                            axis=-1)
        mask = jnp.asarray(subsequent_mask(l))[None, None]
        x, attn_map = self._decoder(x, memory, mask, deterministic=not train,
                                    attention_map=attention_map)
        out = self._generator(x)
        return out, attn_map, x

    def __call__(self, image: jax.Array, text_input: jax.Array,
                 train: bool = False,
                 attention_map: Optional[jax.Array] = None):
        """Teacher-forced forward: dense (B, L, out) predictions.

        Replaces the reference's forward(image, text_length, text_input)
        ragged packing — callers apply their own length masks.
        """
        memory = self.encode(image, train)
        pred, attn_map, hidden = self.decode_step(
            memory, text_input, train, attention_map)
        return {"pred": pred, "map": attn_map, "conv": memory,
                "hidden": hidden}


@partial(jax.jit, static_argnums=(0, 3, 4))
def greedy_decode(model: OCRTransformer, variables, image: jax.Array,
                  max_len: int, start_id: int = 0) -> jax.Array:
    """Autoregressive greedy decode as a fixed-length device loop.

    Encodes once, then `max_len` decoder passes over the padded token
    buffer — position i's logits depend only on tokens <= i (causal mask),
    so overwriting one slot per step reproduces the reference's
    conv-feature-cached eval loop (sld/train.py:110-121) with static shapes.
    Returns (B, max_len) predicted ids (token i predicted from prefix i).

    Jitted end-to-end with the (hashable) module as a static arg: eval is
    ONE device dispatch per batch — essential over the remote-TPU tunnel
    (~1.4 s/dispatch) — and the encode + loop compile as one program.
    """
    b = image.shape[0]
    memory = model.apply(variables, image, method=model.encode)

    def body(i, tokens):
        out, _, _ = model.apply(variables, memory, tokens,
                                method=model.decode_step)
        nxt = jnp.argmax(out[:, i, :], axis=-1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, i + 1))

    tokens = jnp.full((b, max_len + 1), start_id, dtype=jnp.int32)
    tokens = jax.lax.fori_loop(0, max_len, body, tokens)
    return tokens[:, 1:]


@partial(jax.jit, static_argnums=(0, 4, 5))
def greedy_decode_gallery(model: OCRTransformer, variables, image: jax.Array,
                          gallery: jax.Array, max_len: int,
                          start_id: int = 0) -> jax.Array:
    """Greedy decode for embedding generators (CCR-CLIP stage 2): each
    step's output embedding is L2-normalised and matched against the frozen
    `gallery` (V, D) by cosine logits (image-ids-CTR/train.py:120-134).
    Jitted end-to-end like `greedy_decode`."""
    b = image.shape[0]
    memory = model.apply(variables, image, method=model.encode)
    g = gallery.astype(jnp.float32)

    def body(i, tokens):
        out, _, _ = model.apply(variables, memory, tokens,
                                method=model.decode_step)
        emb = out[:, i, :].astype(jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                                1e-8)
        logits = emb @ g.T
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))

    tokens = jnp.full((b, max_len + 1), start_id, dtype=jnp.int32)
    tokens = jax.lax.fori_loop(0, max_len, body, tokens)
    return tokens[:, 1:]
