"""Segmentation metrics: intersect_and_union histograms -> mIoU / mDice /
mFscore.

Rebuild of mmseg/core/evaluation/metrics.py:26-330. The per-image
histograms are computed on device (one one-hot matmul) and reduced across
the data mesh axis with psum in distributed eval — replacing the
reference's collect_results_cpu gather (mmseg/apis/test.py:140-233).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def intersect_and_union(pred: jax.Array, label: jax.Array, num_classes: int,
                        ignore_index: int = 255):
    """-> (intersect, union, pred_area, label_area), each [num_classes]."""
    valid = (label != ignore_index)
    pred = jnp.where(valid, pred, num_classes)
    label = jnp.where(valid, label, num_classes)

    def hist(x):
        return jnp.bincount(x.reshape(-1), length=num_classes + 1
                            )[:num_classes]

    inter = hist(jnp.where(pred == label, pred, num_classes))
    pred_area = hist(pred)
    label_area = hist(label)
    union = pred_area + label_area - inter
    return inter, union, pred_area, label_area


def total_metrics(inter: np.ndarray, union: np.ndarray,
                  pred_area: np.ndarray, label_area: np.ndarray,
                  beta: int = 1) -> Dict[str, np.ndarray]:
    """Accumulated histograms -> per-class IoU/Dice/F-score + aAcc."""
    eps = np.finfo(np.float64).eps
    iou = inter / np.maximum(union, eps)
    dice = 2 * inter / np.maximum(pred_area + label_area, eps)
    precision = inter / np.maximum(pred_area, eps)
    recall = inter / np.maximum(label_area, eps)
    fscore = ((1 + beta ** 2) * precision * recall
              / np.maximum(beta ** 2 * precision + recall, eps))
    acc = inter / np.maximum(label_area, eps)
    return {
        "aAcc": float(inter.sum() / max(label_area.sum(), eps)),
        "IoU": iou, "mIoU": float(np.nanmean(iou)),
        "Dice": dice, "mDice": float(np.nanmean(dice)),
        "Fscore": fscore, "mFscore": float(np.nanmean(fscore)),
        "Precision": precision, "Recall": recall,
        "Acc": acc, "mAcc": float(np.nanmean(acc)),
    }
