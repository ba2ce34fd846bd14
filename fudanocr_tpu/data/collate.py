"""Host-side image preprocessing and fixed-shape batching.

Equivalent of scene-text-telescope/dataset/dataset.py:136-270
(resizeNormalize + alignCollate_{syn,real}): PIL bicubic resize to the
target geometry, [0,1] float, optional binary-mask 4th channel (gray
thresholded at its mean), stacked into static-shape NHWC numpy batches that
feed straight into device transfer. All of this stays on host CPU — the
device only ever sees fixed-shape arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def resize_normalize(img: Image.Image, size: Tuple[int, int],
                     mask: bool = False) -> np.ndarray:
    """PIL image -> (H, W, C) float32 in [0,1]; `size` is (width, height)."""
    img = img.resize(size, Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    if mask:
        gray = np.asarray(img.convert("L"), dtype=np.float32)
        thres = gray.mean()
        m = (gray <= thres).astype(np.float32)[..., None]
        arr = np.concatenate([arr, m], axis=-1)
    return arr


def sr_collate(batch: Sequence, img_h: int = 32, img_w: int = 128,
               down_sample_scale: int = 2, mask: bool = False,
               synthetic_lr: bool = False):
    """(hr, lr, label) triples -> (hr [B,H,W,C], lr [B,H/s,W/s,C], labels).

    With `synthetic_lr` the LR image is produced by bicubic-downsampling the
    HR source (alignCollate_syn, dataset.py:240-254); otherwise the stored
    LR image is used (alignCollate_real).
    """
    hr_size = (img_w, img_h)
    lr_size = (img_w // down_sample_scale, img_h // down_sample_scale)

    hrs, lrs, labels = [], [], []
    for item in batch:
        if synthetic_lr:
            img, label = item
            hr_img, lr_img = img, img.resize(
                (img.size[0] // down_sample_scale,
                 img.size[1] // down_sample_scale), Image.BICUBIC)
        else:
            hr_img, lr_img, label = item
        hrs.append(resize_normalize(hr_img, hr_size, mask))
        lrs.append(resize_normalize(lr_img, lr_size, mask))
        labels.append(label)
    return np.stack(hrs), np.stack(lrs), labels
