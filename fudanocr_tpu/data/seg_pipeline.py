"""Segmentation data pipelines (host-side numpy).

Rebuilds of text-focused-Transformers/mmseg/datasets/pipelines/
{loading.py:170-262, transforms.py:13-1073, test_time_aug.py}: composable
callables over a sample dict {'img': HxWx3 uint8, 'gt_seg': HxW uint8}.
Each dataset flavour remaps raw annotation values into {0,1,ignore}
(e.g. TextSeg: 100 -> text, 255 -> ignore; BTS/TotalText/ICDAR13/MLT each
have their own mapping — loading.py:229-262).
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


Sample = Dict[str, np.ndarray]


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, sample: Sample) -> Sample:
        for t in self.transforms:
            sample = t(sample)
        return sample


class LoadImageFromFile:
    def __call__(self, sample: Sample) -> Sample:
        if "img" not in sample and "img_path" in sample:
            sample["img"] = np.asarray(
                Image.open(sample["img_path"]).convert("RGB"))
        return sample


SEG_FIELDS = ("gt_seg", "gt_det")


class LoadAnnotations:
    """Load + remap the raw annotation map, and load the det mask when the
    sample has a `det_path` (the reference's det_prefix/`gt_det` loading,
    loading.py:229-242: every dataset's det rule is 255 -> 1).

    `remap` is a per-dataset value function over the raw array (see the
    REMAPS table below, mirroring LoadAnnotations_{textseg,BTS,totaltext,
    icdar13,mlt})."""

    def __init__(self, remap: Optional[Callable] = None):
        self.remap = remap

    def __call__(self, sample: Sample) -> Sample:
        if "gt_seg" not in sample and "seg_path" in sample:
            sample["gt_seg"] = np.asarray(Image.open(sample["seg_path"]))
        if self.remap is not None:
            sample["gt_seg"] = self.remap(np.asarray(sample["gt_seg"]))
        if "gt_det" not in sample and sample.get("det_path"):
            det = np.asarray(Image.open(sample["det_path"])).squeeze()
            det = det.copy()
            det[det == 255] = 1
            sample["gt_det"] = det
        return sample


def remap_textseg(seg: np.ndarray) -> np.ndarray:
    """loading.py:221-223: 100 -> text, 200 -> bg; 255 stays (ignore)."""
    out = seg.copy()
    out[seg == 100] = 1
    out[seg == 200] = 0
    return out


def remap_bts(seg: np.ndarray) -> np.ndarray:
    """loading.py:313: 255 -> 1, everything else unchanged."""
    out = seg.copy()
    out[seg == 255] = 1
    return out


def remap_totaltext(seg: np.ndarray) -> np.ndarray:
    """loading.py:407-408: grayscale threshold at 127."""
    return (seg > 127).astype(np.uint8)


def remap_icdar13(seg: np.ndarray) -> np.ndarray:
    """loading.py:500-507: RGB annotation -> gray, 255 -> bg, >0 -> text."""
    if seg.ndim == 3:
        import cv2
        seg = cv2.cvtColor(seg, cv2.COLOR_RGB2GRAY)
    out = seg.copy()
    out[seg == 255] = 0
    out[(seg > 0) & (seg != 255)] = 1
    return out


def remap_mlt(seg: np.ndarray) -> np.ndarray:
    """loading.py:595-600: no value remap (label_map only, unused)."""
    return seg


# dataset name -> remap function (loading.py per-dataset classes)
REMAPS = {
    "textseg": remap_textseg,
    "bts": remap_bts,
    "totaltext": remap_totaltext,
    "icdar13": remap_icdar13,
    "mlt": remap_mlt,
}


class Resize:
    """Ratio-range random resize (transforms.py Resize:183-207,247-283).

    `keep_ratio=True` (the mmseg default every reference config relies
    on) follows mmcv.imrescale: the sampled scale box
    (img_scale[0]*ratio, img_scale[1]*ratio) bounds the LONG and SHORT
    edges and the image is rescaled by ONE factor
    min(long/max(h,w), short/min(h,w)) — each image keeps its own aspect
    ratio. `keep_ratio=False` is the old direct (w, h) resize."""

    def __init__(self, img_scale: Tuple[int, int],
                 ratio_range: Tuple[float, float] = (0.5, 2.0),
                 keep_ratio: bool = True,
                 rng: Optional[random.Random] = None):
        self.img_scale = img_scale
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.rng = rng or random

    def target_size(self, hw: Tuple[int, int], ratio: float
                    ) -> Tuple[int, int]:
        """(h, w) in -> (h', w') out for a sampled ratio (testable
        geometry rule)."""
        sw = int(self.img_scale[0] * ratio)
        sh = int(self.img_scale[1] * ratio)
        if not self.keep_ratio:
            return max(sh, 1), max(sw, 1)
        h, w = hw
        long_edge, short_edge = max(sw, sh), min(sw, sh)
        f = min(long_edge / max(h, w), short_edge / min(h, w))
        # mmcv._scale_size rounding: int(dim * f + 0.5)
        return max(int(h * f + 0.5), 1), max(int(w * f + 0.5), 1)

    def __call__(self, sample: Sample) -> Sample:
        ratio = self.rng.uniform(*self.ratio_range)
        h, w = self.target_size(sample["img"].shape[:2], ratio)
        img = Image.fromarray(sample["img"]).resize((w, h), Image.BILINEAR)
        sample["img"] = np.asarray(img)
        for key in SEG_FIELDS:
            if key in sample:
                seg = Image.fromarray(sample[key]).resize((w, h),
                                                          Image.NEAREST)
                sample[key] = np.asarray(seg)
        return sample


class RandomCrop:
    def __init__(self, crop_size: Tuple[int, int],
                 cat_max_ratio: float = 0.75,
                 ignore_index: int = 255,
                 rng: Optional[random.Random] = None):
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index
        self.rng = rng or random

    def _crop_box(self, shape):
        h, w = shape[:2]
        ch, cw = self.crop_size
        y = self.rng.randint(0, max(h - ch, 0))
        x = self.rng.randint(0, max(w - cw, 0))
        return y, x

    def __call__(self, sample: Sample) -> Sample:
        ch, cw = self.crop_size
        img, seg = sample["img"], sample.get("gt_seg")
        for _ in range(10):
            y, x = self._crop_box(img.shape)
            crop_seg = None if seg is None else seg[y:y + ch, x:x + cw]
            if seg is None or self.cat_max_ratio >= 1.0:
                break
            labels, counts = np.unique(crop_seg, return_counts=True)
            counts = counts[labels != self.ignore_index]
            if len(counts) > 1 and counts.max() / counts.sum() \
                    < self.cat_max_ratio:
                break
        sample["img"] = img[y:y + ch, x:x + cw]
        for key in SEG_FIELDS:
            if key in sample:
                sample[key] = sample[key][y:y + ch, x:x + cw]
        return sample


class RandomFlip:
    def __init__(self, prob: float = 0.5,
                 rng: Optional[random.Random] = None):
        self.prob = prob
        self.rng = rng or random

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() < self.prob:
            sample["img"] = sample["img"][:, ::-1].copy()
            for key in SEG_FIELDS:
                if key in sample:
                    sample[key] = sample[key][:, ::-1].copy()
        return sample


class PhotoMetricDistortion:
    """brightness/contrast/saturation/hue jitter
    (transforms.py:862-975): each op applies with prob 1/2, and a mode
    coin decides whether CONTRAST runs before (mode 1) or after (mode 0)
    the saturation/hue pair — the reference's contrast-first/last split."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta: int = 18, rng: Optional[random.Random] = None):
        self.bd = brightness_delta
        self.cr = contrast_range
        self.sr = saturation_range
        self.hd = hue_delta
        self.rng = rng or random

    def _contrast(self, img):
        if self.rng.random() < 0.5:
            img = img * self.rng.uniform(*self.cr)
        return img

    def __call__(self, sample: Sample) -> Sample:
        img = sample["img"].astype(np.float32)
        if self.rng.random() < 0.5:          # brightness
            img = img + self.rng.uniform(-self.bd, self.bd)
        mode = self.rng.random() < 0.5       # randint(2) of the reference
        if mode:
            img = self._contrast(img)
        # saturation/hue via HSV
        if self.rng.random() < 0.5:
            import cv2
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV).astype(np.float32)
            hsv[..., 1] *= self.rng.uniform(*self.sr)
            hsv[..., 0] = (hsv[..., 0]
                           + self.rng.uniform(-self.hd, self.hd)) % 180
            img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                               cv2.COLOR_HSV2RGB).astype(np.float32)
        if not mode:
            img = self._contrast(img)
        sample["img"] = np.clip(img, 0, 255).astype(np.uint8)
        return sample


class Normalize:
    def __init__(self, mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample: Sample) -> Sample:
        sample["img"] = ((sample["img"].astype(np.float32) - self.mean)
                         / self.std)
        return sample


class Pad:
    """Pad to a fixed size (transforms.py Pad). The reference configs set
    `pad_val=0, seg_pad_val=0` for TRAIN (padded pixels count as
    BACKGROUND in the loss — configs/_base_/datasets/BTS.py:15); pass
    seg_pad_val=255 to make padding ignored instead."""

    def __init__(self, size: Tuple[int, int], pad_val: float = 0,
                 seg_pad_val: int = 0, ignore_index: Optional[int] = None):
        self.size = size
        self.pad_val = pad_val
        # ignore_index kept as a deprecated alias of seg_pad_val
        self.seg_pad_val = (ignore_index if ignore_index is not None
                            else seg_pad_val)

    def __call__(self, sample: Sample) -> Sample:
        h, w = sample["img"].shape[:2]
        ph = max(self.size[0] - h, 0)
        pw = max(self.size[1] - w, 0)
        if ph or pw:
            sample["img"] = np.pad(sample["img"],
                                   ((0, ph), (0, pw), (0, 0)),
                                   constant_values=self.pad_val)
            for key in SEG_FIELDS:
                if key in sample:
                    sample[key] = np.pad(
                        sample[key], ((0, ph), (0, pw)),
                        constant_values=self.seg_pad_val)
        return sample
