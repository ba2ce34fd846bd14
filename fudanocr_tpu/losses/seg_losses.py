"""Segmentation losses: CE, Dice, Focal, Tversky, Lovász-softmax, accuracy.

Rebuilds of text-focused-Transformers/mmseg/models/losses/*.py on dense
(B, H, W, C) logits with an (B, H, W) int label map and `ignore_index`.
The Lovász extension sorts per-class errors — O(P log P) on device, which
XLA lowers to a bitonic sort over the FULL-resolution upsampled logits
(the head computes losses at label size, as the reference's decode head
does); `lovasz_softmax_bucketed` is the measured fast path for small
pixel counts.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _valid_mask(labels: jax.Array, ignore_index: int) -> jax.Array:
    return (labels != ignore_index)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       class_weight: Optional[jax.Array] = None,
                       ignore_index: int = 255) -> jax.Array:
    valid = _valid_mask(labels, ignore_index)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction, not take_along_axis: the gather's VJP scatter over
    # B*H*W pixels was one of the seg train step's three hottest ops
    # (profiled 7.7 of 39 ms/step at 512^2); the one-hot multiply-sum
    # backward is a plain broadcast
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = valid.astype(jnp.float32)
    if class_weight is not None:
        w = w * class_weight[safe]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def dice_loss(logits: jax.Array, labels: jax.Array, smooth: float = 1.0,
              ignore_index: int = 255) -> jax.Array:
    c = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)[..., None].astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid
    onehot = jax.nn.one_hot(jnp.where(_valid_mask(labels, ignore_index),
                                      labels, 0), c) * valid
    dims = tuple(range(1, logits.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=dims)
    denom = jnp.sum(probs, axis=dims) + jnp.sum(onehot, axis=dims)
    dice = (2 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def focal_loss(logits: jax.Array, labels: jax.Array, gamma: float = 2.0,
               alpha: float = 0.25, ignore_index: int = 255) -> jax.Array:
    valid = _valid_mask(labels, ignore_index)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pt = jnp.exp(jnp.take_along_axis(logp, safe[..., None], axis=-1))[..., 0]
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = alpha * (1.0 - pt) ** gamma * nll
    w = valid.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def tversky_loss(logits: jax.Array, labels: jax.Array, alpha: float = 0.3,
                 beta: float = 0.7, smooth: float = 1.0,
                 ignore_index: int = 255) -> jax.Array:
    c = logits.shape[-1]
    valid = _valid_mask(labels, ignore_index)[..., None].astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid
    onehot = jax.nn.one_hot(jnp.where(_valid_mask(labels, ignore_index),
                                      labels, 0), c) * valid
    dims = tuple(range(1, logits.ndim - 1))
    tp = jnp.sum(probs * onehot, axis=dims)
    fp = jnp.sum(probs * (1 - onehot), axis=dims)
    fn = jnp.sum((1 - probs) * onehot, axis=dims)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return 1.0 - jnp.mean(tv)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    inter = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jac = 1.0 - inter / jnp.maximum(union, 1e-8)
    return jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])


def lovasz_softmax_bucketed(logits: jax.Array, labels: jax.Array,
                            ignore_index: int = 255,
                            num_buckets: int = 1024) -> jax.Array:
    """Sort-free Lovász-softmax: exact Lovász of the BUCKETED error order.

    The Lovász weights depend on the errors only through their descending
    ORDER. Quantize errors to `num_buckets` levels and the per-position
    weights within a tie-bucket can be distributed uniformly: the Jaccard
    sequence telescopes, so the total weight of bucket k is
    jac(C_k) - jac(C_{k-1}) where C_k are cumulative counts over buckets
    — computable from K-bin histograms alone. On TPU this replaces the
    exact path's two O(P log^2 P) bitonic sorts with compare-reduces
    (P x K) and a K-table lookup. Measured on-chip it wins only at
    P <= ~2^19 pixels per call (plain 512^2 train: 28.4 -> 26.1
    ms/step); at the det 1024^2 shapes the P x K compares overtake the
    sorts (micro: 67 vs 37 ms/val+grad at P = 8.4M), so
    lovasz_impl='auto' (train/seg.py) gates on the pixel count.

    Exactness: equals `lovasz_softmax_loss` when no two distinct error
    values share a bucket; otherwise it is the exact Lovász value of a
    valid tie-broken ordering with tie-averaged per-pixel weights (error
    spread within a bucket < 1/num_buckets). Binary (c == 2) only — the
    textformer recipes; multi-class callers use the sort path.

    Reference math: text-focused-Transformers mmseg/models/losses/
    lovasz_loss.py (lovasz_softmax_flat); redesigned TPU-side.
    """
    c = logits.shape[-1]
    assert c == 2, "bucketed Lovász implements the binary textformer case"
    probs = jax.nn.softmax(
        logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    flat = labels.reshape(-1)
    valid = (flat != ignore_index)
    safe = jnp.where(valid, flat, 0)
    k = num_buckets

    # shared error vector (|fg1 - p1| == |fg0 - p0| pointwise)
    fg0 = ((safe == 0) & valid).astype(jnp.float32)
    fg1 = ((safe == 1) & valid).astype(jnp.float32)
    errors = jnp.where(valid, jnp.abs(fg0 - probs[:, 0]), 0.0)
    e_sg = jax.lax.stop_gradient(errors)
    # bucket 0 = highest error (descending order, as the sort path)
    b = (k - 1) - jnp.clip((e_sg * (k - 1) + 0.5).astype(jnp.int32), 0, k - 1)

    # K-bin histograms via broadcast-compare reduces. Two alternatives
    # measured on-chip and rejected (scripts/exp_lovasz_{r5,micro}.py):
    # a two-level MXU formulation (hist[hi, lo] as a skinny
    # (32, P) @ (P, 96) dot over bf16 one-hots) ran 67 ms vs the sort's
    # 37 ms at P = 8.4M and 5.96 vs 4.39 ms at P = 0.5M — the K-deep
    # contraction tiles poorly; and K = 4096 variants scale the compare
    # cost 4x. This compare form is what wins in-step at the plain
    # 512^2 recipe (26.1 vs 28.4 ms/step).
    oh = (b[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :])
    ohf = oh.astype(jnp.float32)
    cnt = jnp.sum(ohf, axis=0)                       # c_k
    g0 = jnp.sum(ohf * fg0[:, None], axis=0)         # fg0 per bucket
    vk = jnp.sum(ohf * valid.astype(jnp.float32)[:, None], axis=0)
    g1 = vk - g0

    def bucket_weights(g, gts):
        cg = jnp.cumsum(g)
        cc = jnp.cumsum(cnt)
        inter = gts - cg
        union = gts + (cc - cg)
        jac = 1.0 - inter / jnp.maximum(union, 1e-8)
        wsum = jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])  # jac(C_-1)=0
        return wsum / jnp.maximum(cnt, 1.0)

    p0, p1 = jnp.sum(fg0) > 0, jnp.sum(fg1) > 0
    wbar = jnp.where(p0, bucket_weights(g0, jnp.sum(fg0)), 0.0) \
        + jnp.where(p1, bucket_weights(g1, jnp.sum(fg1)), 0.0)
    w_px = jnp.take(jax.lax.stop_gradient(wbar), b)
    loss = jnp.sum(errors * w_px)
    present = p0.astype(jnp.float32) + p1.astype(jnp.float32)
    return loss / jnp.maximum(present, 1.0)


def lovasz_softmax_loss(logits: jax.Array, labels: jax.Array,
                        ignore_index: int = 255) -> jax.Array:
    """Lovász-softmax over all valid pixels, mean over present classes."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(
        logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    flat = labels.reshape(-1)
    valid = (flat != ignore_index)
    safe = jnp.where(valid, flat, 0)

    if c == 2:
        # binary case (every textformer config): the two classes share ONE
        # error vector — |fg1 - p1| = |(1-fg0) - (1-p0)| = |fg0 - p0|
        # pointwise — so a single sort orders both, halving the sort cost
        # (the dominant loss op at 512^2)
        fg0 = ((safe == 0) & valid).astype(jnp.float32)
        fg1 = ((safe == 1) & valid).astype(jnp.float32)
        errors = jnp.where(valid, jnp.abs(fg0 - probs[:, 0]), 0.0)
        e_sg = jax.lax.stop_gradient(errors)
        # a TPU bitonic sort moves EVERY operand through all log^2(P)
        # compare-swap passes, so payload bytes are what the sort costs:
        # pack (iota, fg0, valid) into ONE int32 (2 low bits are flags)
        # instead of sorting three separate payload vectors
        iota = jnp.arange(e_sg.shape[0], dtype=jnp.int32)
        packed = (iota << 2) | (fg0.astype(jnp.int32) << 1) \
            | valid.astype(jnp.int32)
        _, packed_s = jax.lax.sort((-e_sg, packed), num_keys=1,
                                   is_stable=False)
        fg0_s = ((packed_s >> 1) & 1).astype(jnp.float32)
        v_s = (packed_s & 1).astype(jnp.float32)
        idx_s = packed_s >> 2
        p0, p1 = jnp.sum(fg0) > 0, jnp.sum(fg1) > 0
        # the two per-class losses are sums over the SAME error vector, so
        # the present-gated weights can be merged before the un-permuting
        # sort — one f32 payload instead of two
        w = jnp.where(p0, _lovasz_grad(fg0_s), 0.0) \
            + jnp.where(p1, _lovasz_grad(v_s - fg0_s), 0.0)
        _, w_o = jax.lax.sort((idx_s, w), num_keys=1, is_stable=False)
        loss = jnp.sum(errors * jax.lax.stop_gradient(w_o))
        present = p0.astype(jnp.float32) + p1.astype(jnp.float32)
        return loss / jnp.maximum(present, 1.0)

    def per_class(ci):
        fg = ((safe == ci) & valid).astype(jnp.float32)
        errors = jnp.where(valid, jnp.abs(fg - probs[:, ci]), 0.0)
        # The Lovász weights w depend on the SORTED ORDER only, and autodiff
        # through a sort treats the permutation as locally constant — so
        # compute the weights entirely under stop_gradient and express the
        # loss as sum(errors * w_in_original_order). Differentiating
        # lax.sort directly cost ~14 of 39 ms/step at 512^2 (a 4-operand
        # stable sort + a VJP permutation-gather fusion); here the backward
        # is a broadcast multiply. w is carried back to original index
        # order by a SECOND sort keyed on the permutation indices (a TPU
        # sort is far cheaper than the serial scatter XLA would emit).
        e_sg = jax.lax.stop_gradient(errors)
        iota = jnp.arange(e_sg.shape[0], dtype=jnp.int32)
        _, fg_sorted, idx_sorted = jax.lax.sort(
            (-e_sg, fg, iota), num_keys=1, is_stable=False)
        w = _lovasz_grad(fg_sorted)
        _, w_orig = jax.lax.sort((idx_sorted, w), num_keys=1,
                                 is_stable=False)
        loss_c = jnp.sum(errors * jax.lax.stop_gradient(w_orig))
        present = jnp.sum(fg) > 0
        return jnp.where(present, loss_c, 0.0), present.astype(jnp.float32)

    losses, present = jax.vmap(per_class)(jnp.arange(c))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1.0)


def seg_accuracy(logits: jax.Array, labels: jax.Array,
                 ignore_index: int = 255) -> jax.Array:
    valid = _valid_mask(labels, ignore_index)
    pred = jnp.argmax(logits, axis=-1)
    hit = ((pred == labels) & valid).astype(jnp.float32)
    return jnp.sum(hit) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
