"""SR training losses: MSE + text-focus (attention L1 + confusion-weighted CE).

Rebuild of scene-text-telescope/loss/text_focus_loss.py:40-104 and
loss/weight_ce_loss.py:10-47. The frozen recognizer ("oracle") is an
`OCRTransformer(vocab=37, num_in=1, layers=(1,2,5,3), num_heads=16)` whose
variables are passed in and never trained — both HR and SR branches run
under `lax.stop_gradient`-free forward but gradients flow only through the
SR *images*, exactly as in the reference (the torch oracle is eval()'d but
not detached).

TPU deviations (documented):
  * labels are fixed-shape (B, Lmax) with a length mask; the CE and the
    attention-map L1 are masked means over valid positions instead of the
    reference's ragged packing / full-tensor mean.
  * the 37x37 confusion-weight table is optional (the reference loads a
    pickled matrix shipped via Baidu, text_focus_loss.py is hardcoded to
    ./dataset/mydata/confuse.pkl); without it the weighted CE reduces to
    standard CE.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# '-' = 0 is both the start token and the padding index, as in the reference
# english_alphabet (text_focus_loss.py:47).
ENGLISH_ALPHABET = "-0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
LOSS_VOCAB = 37  # '-' + 0-9 + a-z (loss/transformer.py:8)


def to_gray(img: jax.Array) -> jax.Array:
    """NHWC RGB -> single-channel luma (text_focus_loss.py:16-21)."""
    r, g, b = img[..., 0:1], img[..., 1:2], img[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def encode_text_labels(labels, max_len: int) -> Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """Host-side codec (text_focus_loss.py:62-81): filter to the 37-char
    vocab, append the '-' terminator, build the shift-right decoder input
    and the dense target grid.

    Returns (text_input [B,L], text_gt [B,L], lengths [B]).
    """
    from fudanocr_tpu.eval.metrics import str_filt

    b = len(labels)
    text_input = np.zeros((b, max_len), dtype=np.int32)
    text_gt = np.zeros((b, max_len), dtype=np.int32)
    lengths = np.zeros((b,), dtype=np.int32)
    char_to_idx = {ch: i for i, ch in enumerate(ENGLISH_ALPHABET)}
    for i, raw in enumerate(labels):
        s = str_filt(raw, "lower") + "-"
        s = s[:max_len]
        ids = [char_to_idx[ch] for ch in s]
        lengths[i] = len(ids)
        text_gt[i, :len(ids)] = ids
        # decoder input: start token (0) then the label shifted right
        text_input[i, 1:len(ids)] = ids[:-1]
    return text_input, text_gt, lengths


def weighted_cross_entropy(pred: jax.Array, gt: jax.Array,
                           mask: jax.Array,
                           weight_table: Optional[jax.Array] = None
                           ) -> jax.Array:
    """Confusion-weighted CE (weight_ce_loss.py:37-46), masked mean.

    pred (B, L, C) logits, gt (B, L) ids, mask (B, L) {0,1}.
    loss_i = -log( w[gt_i, gt_i] * exp(p_gt) / sum_j w[gt_i, j] * exp(p_j) ).
    """
    logp = pred.astype(jnp.float32)
    if weight_table is not None:
        w = weight_table[gt]  # (B, L, C)
        # log-space: log(w*exp(p)) = p + log(w)
        logp = logp + jnp.log(jnp.maximum(w, 1e-20))
    logz = jax.nn.logsumexp(logp, axis=-1)
    gt_logit = jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
    nll = logz - gt_logit
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def load_confuse_weight_table(path: str) -> np.ndarray:
    """Rearrange the raw 62x62 confusion counts into the 37x37 inverse-
    frequency weight table (weight_ce_loss.py:10-33)."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    number, upper, lower = data[:10], data[10:36], data[36:]
    end = np.ones((1, 62))
    pad = np.ones((63, 1))
    re = np.concatenate((end, number, lower, upper), axis=0)
    re = np.concatenate((pad, re), axis=1)
    with np.errstate(divide="ignore"):
        re = 1.0 / re
    re[np.isinf(re)] = 1.0
    lower_alpha = "abcdefghijklmnopqrstuvwxyz"
    for i in range(63):
        for j in range(63):
            if i != j and ENGLISH_ALPHABET[j] in lower_alpha:
                re[i][j] = max(re[i][j], re[i][j + 26])
    return re[:37, :37].astype(np.float32)


class TextFocusLoss:
    """mse + 10 * L1(attn maps HR vs SR) + 5e-4 * weighted CE on SR preds.

    `oracle` is the frozen loss transformer; its variables are captured at
    construction and treated as constants inside the jitted train step.
    """

    def __init__(self, oracle_model, oracle_variables,
                 weight_table: Optional[np.ndarray] = None,
                 text_focus: bool = True):
        self.oracle = oracle_model
        self.oracle_vars = oracle_variables
        self.weight_table = (None if weight_table is None
                             else jnp.asarray(weight_table))
        self.text_focus = text_focus

    def hr_oracle_map(self, hr: jax.Array, text_input: jax.Array) -> jax.Array:
        """The HR branch of the loss: the frozen oracle's attention map on
        the CONSTANT (hr, text_input) pair. Because the oracle never
        trains, this is a pure function of the sample — callers may
        compute it once per sample and feed it back as `hr_map`, removing
        the dominant oracle forward from every subsequent train step
        (the reference recomputes it each step, text_focus_loss.py:84-99
        — beating that is the point)."""
        return self.oracle.apply(self.oracle_vars, to_gray(hr),
                                 text_input)["map"]

    def __call__(self, sr: jax.Array, hr: jax.Array, text_input: jax.Array,
                 text_gt: jax.Array, lengths: jax.Array,
                 hr_map: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        mse = jnp.mean((sr.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2)
        if not self.text_focus:
            return mse, {"mse": mse}

        if hr_map is None:
            hr_map = self.hr_oracle_map(hr, text_input)
        sr_out = self.oracle.apply(self.oracle_vars, to_gray(sr), text_input)

        l = text_gt.shape[1]
        mask = (jnp.arange(l)[None, :] < lengths[:, None])
        map_mask = mask[:, None, :, None].astype(jnp.float32)  # (B,1,L,1)
        map_diff = jnp.abs(hr_map.astype(jnp.float32)
                           - sr_out["map"].astype(jnp.float32)) * map_mask
        denom = jnp.maximum(jnp.sum(map_mask), 1.0) * hr_map.shape[1] \
            * hr_map.shape[3]
        attention_loss = jnp.sum(map_diff) / denom

        recognition_loss = weighted_cross_entropy(
            sr_out["pred"], text_gt, mask, self.weight_table)

        total = mse + attention_loss * 10.0 + recognition_loss * 0.0005
        return total, {"mse": mse, "attention": attention_loss,
                       "recognition": recognition_loss}
