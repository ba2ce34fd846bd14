"""EncoderDecoder segmentor: backbone + decode head, whole/slide inference.

Rebuild of mmseg/models/segmentors/encoder_decoder.py:14-337. Sliding
inference uses a STATIC crop grid (computed from padded canvas size at
trace time) with logit and count accumulation — the reference's dynamic
crop loop (encoder_decoder.py:160-207) would retrace per image size on
TPU, so test images are padded to a bucket first (data/seg_dataset.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fudanocr_tpu.models.seg.cascade_mit import CascadeMiT
from fudanocr_tpu.models.seg.segformer_head import SegformerHead

Dtype = Any


class EncoderDecoder(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module
    align_corners: bool = False

    def extract_feat(self, img: jax.Array, train: bool = False):
        return self.backbone(img, train)

    def encode_decode(self, img: jax.Array, train: bool = False) -> jax.Array:
        """img -> per-pixel class logits at full input resolution."""
        feats = self.backbone(img, train)
        logits = self.decode_head(feats, train)
        return jax.image.resize(
            logits, (logits.shape[0], img.shape[1], img.shape[2],
                     logits.shape[3]), "bilinear")

    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        return self.encode_decode(img, train)


class DetGuidedEncoderDecoder(nn.Module):
    """EncoderDecoder_V4 equivalent (encoder_decoder.py:337): the det-guided
    backbone returns (pyramid, det_logits); forward returns both the seg
    logits (full res) and the det logits (1/4 res) so the trainer can add
    `det_loss_ratio x CE(det_logits, gt_det)` (decode_head.py:244-256)."""

    backbone: nn.Module
    decode_head: nn.Module
    align_corners: bool = False

    def __call__(self, img: jax.Array, train: bool = False):
        feats, det_logits = self.backbone(img, train)
        logits = self.decode_head(feats, train)
        logits = jax.image.resize(
            logits, (logits.shape[0], img.shape[1], img.shape[2],
                     logits.shape[3]), "bilinear")
        return logits, det_logits


def slide_inference(apply_fn, img: jax.Array, crop: Tuple[int, int],
                    stride: Tuple[int, int]) -> jax.Array:
    """Accumulate crop logits over a static grid (encoder_decoder.py:160-207).

    `apply_fn(crop_img) -> (b, ch, cw, C)` logits; the image must already be
    padded so (H - ch) % sh and (W - cw) % sw need not be zero — the last
    row/col of crops is clamped to the border exactly as the reference does.
    """
    b, h, w, _ = img.shape
    ch, cw = crop
    sh, sw = stride
    h_grids = max((h - ch + sh - 1) // sh, 0) + 1
    w_grids = max((w - cw + sw - 1) // sw, 0) + 1

    preds = None
    count = jnp.zeros((1, h, w, 1), jnp.float32)
    for i in range(h_grids):
        for j in range(w_grids):
            y1 = min(i * sh, h - ch)
            x1 = min(j * sw, w - cw)
            patch = jax.lax.dynamic_slice(
                img, (0, y1, x1, 0), (b, ch, cw, img.shape[3]))
            logits = apply_fn(patch).astype(jnp.float32)
            if preds is None:
                preds = jnp.zeros((b, h, w, logits.shape[-1]), jnp.float32)
            pad = jnp.zeros_like(preds)
            pad = jax.lax.dynamic_update_slice(pad, logits, (0, y1, x1, 0))
            preds = preds + pad
            cpad = jax.lax.dynamic_update_slice(
                jnp.zeros((1, h, w, 1), jnp.float32),
                jnp.ones((1, ch, cw, 1), jnp.float32), (0, y1, x1, 0))
            count = count + cpad
    return preds / jnp.maximum(count, 1.0)
