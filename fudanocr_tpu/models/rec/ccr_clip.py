"""CCR-CLIP (ICCV-23): dual-encoder aligning character images with their
radical (IDS) sequences.

Rebuild of image-ids-CTR/CCR-CLIP/model.py:135-221 + resnet50.py:13-111:

* image tower — ResNet-50 bottleneck stack with a 3x3 stride-1 stem (NOT
  the torchvision 7x7/2 stem), 3x3/2/1 max pool, global average pool ->
  2048-d features;
* text tower — 12-layer pre-LN transformer (width 512, 8 heads, GELU MLP
  x4) over radical tokens with causal masking, learned positional
  embeddings, final LayerNorm, EOT pooling at the '$' token (= argmax of
  token ids, model.py:205) and a 512->2048 projection;
* learnable logit_scale initialised to ln(1/0.07).

TPU-first: both towers run in bf16-able NHWC/einsum form; attention uses
one fused MHA per block. Feature normalisation happens in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out_ch = self.planes * 4
        r = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        # explicit (1,1) padding: torch pads symmetrically for strided
        # 3x3 convs while XLA's SAME pads (0,1) — different alignment
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            r = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down_conv")(r)
            r = bn("down_bn")(r)
        return nn.relu(y + r)


class CLIPResNet50(nn.Module):
    """resnet50.py:51-111 — 3x3/1 stem, 4 bottleneck stages, GAP -> 2048."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(64, (3, 3), use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2), "VALID")

        in_ch = 64
        for s, (n, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for i in range(n):
                stride = 2 if (i == 0 and s > 0) else 1
                down = (i == 0 and (stride != 1 or in_ch != planes * 4))
                x = Bottleneck(planes, stride, down, dtype=self.dtype,
                               name=f"layer{s+1}_{i}")(x, train)
                in_ch = planes * 4
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = True) -> jax.Array:
        b, l, d = x.shape
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.heads
        q = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        s = s / math.sqrt(hd)
        if causal:
            mask = jnp.tril(jnp.ones((l, l), bool))
            s = jnp.where(mask[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU (model.py:59-62)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class VisionTransformer(nn.Module):
    """CLIP ViT image tower (CCR-CLIP/model.py:99-132). The reference
    defines it but selects the ResNet at model.py:148-149; kept for
    completeness/config parity."""

    patch_size: int = 16
    width: int = 512
    layers: int = 6
    heads: int = 8
    output_dim: int = 2048
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    (self.patch_size, self.patch_size), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = x.reshape(b, -1, self.width)
        scale = self.width ** -0.5
        cls = self.param("class_embedding",
                         nn.initializers.normal(scale), (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x],
            axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(scale),
                         (x.shape[1], self.width))
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       dtype=self.dtype,
                                       name=f"block{i}")(x, causal=False)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(scale),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)


class CCRCLIP(nn.Module):
    vocab_size: int
    embed_dim: int = 2048
    context_length: int = 30
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    dtype: Optional[Dtype] = None

    def setup(self):
        self.visual = CLIPResNet50(dtype=self.dtype, name="visual")
        self.token_embedding = nn.Embed(
            self.vocab_size, self.transformer_width,
            embedding_init=nn.initializers.normal(0.02),
            name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.transformer_width))
        self.blocks = [ResidualAttentionBlock(self.transformer_width,
                                              self.transformer_heads,
                                              dtype=self.dtype,
                                              name=f"block{i}")
                       for i in range(self.transformer_layers)]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.transformer_width ** -0.5),
            (self.transformer_width, self.embed_dim))
        self.logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.asarray(np.log(1.0 / 0.07), jnp.float32), ())

    def encode_image(self, image: jax.Array, train: bool = False) -> jax.Array:
        return self.visual(image, train)

    def encode_text(self, text: jax.Array) -> jax.Array:
        x = self.token_embedding(text)
        x = x + self.positional_embedding[None, :x.shape[1]].astype(x.dtype)
        for block in self.blocks:
            x = block(x, causal=True)
        x = self.ln_final(x)
        # EOT pooling: '$' has the highest token id (utils.py:16-17)
        eot = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection.astype(pooled.dtype)

    def __call__(self, image: jax.Array, text: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        img = self.encode_image(image, train).astype(jnp.float32)
        txt = self.encode_text(text).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=1, keepdims=True)
        return img, txt, jnp.exp(self.logit_scale)
