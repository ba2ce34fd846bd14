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
                     mask: bool = False,
                     dtype: type = np.float32) -> np.ndarray:
    """PIL image -> (H, W, C) `dtype`; `size` is (width, height).

    dtype=float32 (default): values in [0,1], the classic collate.
    dtype=uint8: raw 0..255 bytes — normalization (`/255`) is deferred to
    the device (`normalize_uint8` inside the jitted step), which moves 4x
    fewer bytes across H2D and drops the per-pixel float conversion from
    the host loop. The binary mask channel is stored as 0/255 so ONE
    uniform `/255` on device recovers the float collate exactly.
    """
    img = img.resize(size, Image.BICUBIC)
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    if mask:
        gray = np.asarray(img.convert("L"), dtype=np.float32)
        thres = gray.mean()
        m = np.where(gray <= thres, np.uint8(255), np.uint8(0))[..., None]
        arr = np.concatenate([arr, m], axis=-1)
    if dtype == np.uint8:
        return arr
    return arr.astype(np.float32) / 255.0


def normalize_uint8(x):
    """Device-side half of the uint8 collate: uint8 0..255 -> float [0,1].

    Matches the float32 host collate bit-exactly (same `/ 255.0` division
    on the same bytes). Call inside the jitted step on the device_put
    batch."""
    import jax.numpy as jnp

    return x.astype(jnp.float32) / 255.0


def sr_collate(batch: Sequence, img_h: int = 32, img_w: int = 128,
               down_sample_scale: int = 2, mask: bool = False,
               synthetic_lr: bool = False, dtype: type = np.float32):
    """(hr, lr, label) triples -> (hr [B,H,W,C], lr [B,H/s,W/s,C], labels).

    With `synthetic_lr` the LR image is produced by bicubic-downsampling the
    HR source (alignCollate_syn, dataset.py:240-254); otherwise the stored
    LR image is used (alignCollate_real). `dtype=np.uint8` defers the /255
    normalization to the device (see resize_normalize).
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
        hrs.append(resize_normalize(hr_img, hr_size, mask, dtype))
        lrs.append(resize_normalize(lr_img, lr_size, mask, dtype))
        labels.append(label)
    return np.stack(hrs), np.stack(lrs), labels
