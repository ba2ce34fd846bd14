"""EncoderDecoder segmentor: backbone + decode head, whole/slide inference.

Rebuild of mmseg/models/segmentors/encoder_decoder.py:14-337. Sliding
inference uses a STATIC crop grid (computed from padded canvas size at
trace time) with logit and count accumulation — the reference's dynamic
crop loop (encoder_decoder.py:160-207) would retrace per image size on
TPU, so test images are padded to a bucket first (data/seg_dataset.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

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


class CascadeEncoderDecoder(nn.Module):
    """Multi-stage decode heads, each refining the previous prediction
    (mmseg/models/segmentors/cascade_encoder_decoder.py:12-98): head k>0
    receives the backbone features plus the previous stage's logits
    (resized to the 1/4 scale) as an extra input channel block."""

    backbone: nn.Module
    decode_heads: Sequence[nn.Module]
    align_corners: bool = False

    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        feats = self.backbone(img, train)
        logits = self.decode_heads[0](feats, train)
        for head in self.decode_heads[1:]:
            prev = jax.image.resize(
                logits, (logits.shape[0], feats[0].shape[1],
                         feats[0].shape[2], logits.shape[3]), "bilinear")
            feats_aug = [jnp.concatenate([feats[0], prev], axis=-1)] \
                + list(feats[1:])
            logits = head(feats_aug, train)
        return jax.image.resize(
            logits, (logits.shape[0], img.shape[1], img.shape[2],
                     logits.shape[3]), "bilinear")


class DetGuidedEncoderDecoder(nn.Module):
    """EncoderDecoder_V4 equivalent (encoder_decoder.py:337): the det-guided
    backbone returns (pyramid, det_logits); forward returns both the seg
    logits (full res) and the det logits (1/4 res) so the trainer can add
    `det_loss_ratio x CE(det_logits, gt_det)` (decode_head.py:244-256)."""

    backbone: nn.Module
    decode_head: nn.Module
    align_corners: bool = False

    def __call__(self, img: jax.Array, train: bool = False,
                 det_gt: Optional[jax.Array] = None):
        feats, det_logits = self.backbone(img, train, det_gt=det_gt)
        logits = self.decode_head(feats, train)
        logits = jax.image.resize(
            logits, (logits.shape[0], img.shape[1], img.shape[2],
                     logits.shape[3]), "bilinear")
        return logits, det_logits


def tta_inference(apply_fn, img: jax.Array,
                  scales: Sequence[float] = (1.0,),
                  flip: bool = True) -> jax.Array:
    """MultiScaleFlipAug equivalent (pipelines/test_time_aug.py): run the
    model at each scale (+ horizontal flip), resize logits back and average
    the softmax probabilities. Returns full-res averaged probs."""
    b, h, w, _ = img.shape
    acc = None
    n = 0
    for s in scales:
        variants = [img if s == 1.0 else jax.image.resize(
            img, (b, int(h * s), int(w * s), img.shape[3]), "bilinear")]
        if flip:
            variants.append(variants[0][:, :, ::-1, :])
        for vi, v in enumerate(variants):
            logits = apply_fn(v)
            if vi == 1:
                logits = logits[:, :, ::-1, :]
            logits = jax.image.resize(
                logits, (b, h, w, logits.shape[3]), "bilinear")
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            acc = p if acc is None else acc + p
            n += 1
    return acc / n


def slide_inference(apply_fn, img: jax.Array, crop: Tuple[int, int],
                    stride: Tuple[int, int],
                    max_fwd_images: int = 16) -> jax.Array:
    """Accumulate crop logits over a static grid (encoder_decoder.py:160-207).

    `apply_fn(crop_img) -> (b, ch, cw, C)` logits; the image must already be
    padded so (H - ch) % sh and (W - cw) % sw need not be zero — the last
    row/col of crops is clamped to the border exactly as the reference does.

    Crops run as BATCHED forwards (sequential batch-1 crops leave the
    skinny-channel B0 stages lane-starved; batching multiplies arithmetic
    intensity at identical numerics — eval-mode BN uses running stats),
    grouped so no forward exceeds ~`max_fwd_images` crop images at once
    (peak activation memory would otherwise scale with grid size x batch;
    a 2048^2 canvas at eval batch 8 is 72 crops).
    """
    import numpy as np

    b, h, w, _ = img.shape
    ch, cw = crop
    sh, sw = stride
    ch, cw = min(ch, h), min(cw, w)
    h_grids = max((h - ch + sh - 1) // sh, 0) + 1
    w_grids = max((w - cw + sw - 1) // sw, 0) + 1

    positions = [(min(i * sh, h - ch), min(j * sw, w - cw))
                 for i in range(h_grids) for j in range(w_grids)]
    crops_per_pass = max(1, max_fwd_images // b)

    logit_groups = []
    for g0 in range(0, len(positions), crops_per_pass):
        group = positions[g0:g0 + crops_per_pass]
        patches = [jax.lax.dynamic_slice(img, (0, y1, x1, 0),
                                         (b, ch, cw, img.shape[3]))
                   for (y1, x1) in group]
        stacked = patches[0] if len(patches) == 1 else jnp.concatenate(
            patches, axis=0)
        logit_groups.append(apply_fn(stacked).astype(jnp.float32))
    logits_all = (logit_groups[0] if len(logit_groups) == 1
                  else jnp.concatenate(logit_groups, axis=0))

    # the count map depends only on the static grid — a host constant
    count_np = np.zeros((1, h, w, 1), np.float32)
    for (y1, x1) in positions:
        count_np[:, y1:y1 + ch, x1:x1 + cw, :] += 1.0
    count = jnp.asarray(np.maximum(count_np, 1.0))

    preds = jnp.zeros((b, h, w, logits_all.shape[-1]), jnp.float32)
    for g, (y1, x1) in enumerate(positions):
        pad = jnp.zeros_like(preds)
        pad = jax.lax.dynamic_update_slice(
            pad, logits_all[g * b:(g + 1) * b], (0, y1, x1, 0))
        preds = preds + pad
    return preds / count
