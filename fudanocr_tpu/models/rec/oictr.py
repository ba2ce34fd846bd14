"""Orientation-independent CTR (IJCAI-23).

Rebuild of orientation-independent-CTR/model/transformer.py:370-496 +
model/reconstruct.py:104-133: the shared ResNet encoder feeds

* a content branch — 1024->512 1x1 conv whose tokens the 512-d decoder
  (4 heads, FFN x2) cross-attends; linear generator over the char alphabet;
* a direction branch — 1024->512 1x1 conv, global average pool, linear;
  a 2-way H/V classifier on top;
* per-character feature maps — cross-attention map x content tokens,
  compressed along the spatial axis to 4 cells -> (512, 2, 2) per char;
* a deconvolution reconstructor that renders each char as a 32x32 RGB
  image from [char_map ; broadcast direction feature] (1024, 2, 2), used
  by the reconstruction + direction-swap losses.

TPU deviations: char maps stay in a dense (B, L, ...) grid with a validity
mask instead of the reference's ragged packing loop (transformer.py:455-
462); the direction-swap index permutation is computed host-side and
passed in as a (B*L,) gather index.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fudanocr_tpu.models.rec.ocr_transformer import (OCRDecoderLayer,
                                                     OCRResNet)
from fudanocr_tpu.nn.attention import positional_encoding_1d, subsequent_mask

Dtype = Any


class CharReconstructor(nn.Module):
    """(N, 2, 2, 2*base) -> (N, 32, 32, 3) deconv stack (reconstruct.py:104;
    reference base=512)."""

    base: int = 512
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = (self.base, self.base // 2, self.base // 4, self.base // 8)
        for i, f in enumerate(feats):
            x = nn.ConvTranspose(f, (5, 5), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, name=f"deconv{i+1}")(x)
            x = nn.relu(x) if i < 3 else jnp.tanh(x)
        x = nn.Conv(3, (5, 5), dtype=self.dtype, name="deconv5")(x)
        return jnp.tanh(x)


class OICTR(nn.Module):
    vocab: int
    d_embed: int = 256
    d_model: int = 512
    num_heads: int = 4
    # override the per-stage block counts (default = reference [3,4,6]);
    # smoke tests pass (1,1,1) to compile a structurally identical but
    # ~5x smaller graph on the 1-core CI host
    encoder_layers: Optional[Tuple[int, ...]] = None
    encoder_width_div: int = 1  # smoke-test channel shrink (see OCRResNet)
    dtype: Optional[Dtype] = None

    def setup(self):
        # the OI-CTR encoder is the WIDE 3-stage variant: stages
        # (256, 512, 1024), pools before stages 0/1, no head conv
        # (orientation-independent-CTR/model/transformer.py:125-199)
        from fudanocr_tpu.models.rec.ocr_transformer import OCR_RESNET_PRESETS
        kw = dict(OCR_RESNET_PRESETS["oictr"])
        if self.encoder_layers is not None:
            kw["layers"] = tuple(self.encoder_layers)
        self._encoder = OCRResNet(3, dtype=self.dtype, name="encoder",
                                  width_div=self.encoder_width_div, **kw)
        self._content = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                                name="content_extractor")
        self._dir_conv = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                                 name="dir_conv")
        self._dir_linear = nn.Dense(self.d_model, dtype=self.dtype,
                                    name="dir_linear")
        self._dir_cls = nn.Dense(2, dtype=self.dtype, name="direction_cls")
        self._embed = nn.Embed(self.vocab, self.d_embed, dtype=self.dtype,
                               name="embed")
        self._decoder = OCRDecoderLayer(self.num_heads, self.d_model,
                                        self.d_model * 2, dtype=self.dtype,
                                        name="decoder")
        self._generator = nn.Dense(self.vocab, dtype=self.dtype,
                                   name="generator")
        self._compress = nn.Dense(4, dtype=self.dtype,
                                  name="features_compress")
        self._construct = CharReconstructor(base=self.d_model,
                                            dtype=self.dtype,
                                            name="reconstructor")

    def encode(self, image: jax.Array, train: bool = False) -> jax.Array:
        """-> (B, Ht*Wt, 512) content tokens (direction branch separate)."""
        raw = self._encoder(image, train)
        content = self._content(raw)
        b, h, w, c = content.shape
        return content.reshape(b, h * w, c)

    def direction_features(self, image: jax.Array,
                           train: bool = False) -> Tuple[jax.Array, jax.Array]:
        raw = self._encoder(image, train)
        d = self._dir_conv(raw)
        d = jnp.mean(d, axis=(1, 2))
        d = self._dir_linear(d)
        return d, self._dir_cls(d)

    def decode_step(self, memory: jax.Array, text_input: jax.Array,
                    train: bool = False,
                    attention_map: Optional[jax.Array] = None):
        b, l = text_input.shape
        emb = self._embed(text_input) * math.sqrt(self.d_embed)
        pe = jnp.asarray(positional_encoding_1d(self.d_embed, l),
                         dtype=emb.dtype)
        x = jnp.concatenate([emb, jnp.broadcast_to(pe, (b, l, self.d_embed))],
                            axis=-1)
        mask = jnp.asarray(subsequent_mask(l))[None, None]
        x, attn_map = self._decoder(x, memory, mask,
                                    deterministic=not train,
                                    attention_map=attention_map)
        return self._generator(x), attn_map, x

    def reconstruct(self, char_maps: jax.Array,
                    dir_feats: jax.Array) -> jax.Array:
        """char_maps (N, d_model, 4), dir_feats (N, d_model) ->
        (N, 32, 32, 3); reference d_model=512."""
        n, d = char_maps.shape[0], self.d_model
        cm = char_maps.reshape(n, d, 2, 2).transpose(0, 2, 3, 1)
        df = jnp.broadcast_to(dir_feats[:, None, None, :], (n, 2, 2, d))
        return self._construct(jnp.concatenate([cm, df], axis=-1))

    def __call__(self, image: jax.Array, text_input: jax.Array,
                 train: bool = False) -> Dict[str, jax.Array]:
        raw = self._encoder(image, train)
        content = self._content(raw)
        b, h, w, c = content.shape
        memory = content.reshape(b, h * w, c)

        pred, attn_map, hidden = self.decode_step(memory, text_input, train)

        # direction branch on the raw 1024-ch features
        d = self._dir_conv(raw)
        direction_feat = self._dir_linear(jnp.mean(d, axis=(1, 2)))
        direction_logits = self._dir_cls(direction_feat)

        # per-char maps: mean attention over heads x content tokens
        # (transformer.py:444-448), spatially compressed to 4 cells
        amap = jnp.mean(attn_map.astype(jnp.float32), axis=1)  # (B, L, HW)
        char_maps = memory[:, None, :, :].astype(jnp.float32) \
            * amap[:, :, :, None]                     # (B, L, HW, C)
        char_maps = self._compress(char_maps.transpose(0, 1, 3, 2))
        # (B, L, C, 4)

        # raw reconstruction (each char rendered with its own direction
        # feature) computed here so the reconstructor's params exist from
        # init; the swapped variant is a separate `reconstruct` call
        l_len = char_maps.shape[1]
        cm_flat = char_maps.reshape(b * l_len, self.d_model, 4)
        df_flat = jnp.repeat(direction_feat, l_len, axis=0)
        raw_imgs = self.reconstruct(cm_flat, df_flat)

        return {"pred": pred, "map": attn_map, "conv": memory,
                "hidden": hidden, "char_maps": char_maps,
                "direction_feat": direction_feat,
                "direction_logits": direction_logits,
                "raw_imgs": raw_imgs}
