"""Segmentation datasets: directory-scan (CustomDataset) + synthetic.

Rebuild of mmseg/datasets/custom.py:19-403 (img_dir/ann_dir scan with
suffix pairing, pipeline application, iteration) plus a hermetic synthetic
text-segmentation generator for tests/smoke training.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from fudanocr_tpu.data.seg_pipeline import Compose, Sample


class SegDataset:
    """Scan img_dir/ann_dir for (image, annotation) pairs and run the
    pipeline. `split` optionally lists basenames to keep."""

    def __init__(self, img_dir: str, ann_dir: str,
                 pipeline: Sequence, img_suffix: str = ".jpg",
                 seg_suffix: str = ".png",
                 split: Optional[str] = None):
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.pipeline = Compose(pipeline)
        names = sorted(
            f[:-len(img_suffix)] for f in os.listdir(img_dir)
            if f.endswith(img_suffix))
        if split:
            keep = {l.strip() for l in open(split)}
            names = [n for n in names if n in keep]
        self.samples = [
            (os.path.join(img_dir, n + img_suffix),
             os.path.join(ann_dir, n + seg_suffix)) for n in names]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Sample:
        img_path, seg_path = self.samples[idx]
        return self.pipeline({"img_path": img_path, "seg_path": seg_path})

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0):
        order = list(range(len(self)))
        if shuffle:
            random.Random(seed).shuffle(order)
        for s in range(0, len(self) - batch_size + 1, batch_size):
            items = [self[i] for i in order[s:s + batch_size]]
            yield (np.stack([it["img"] for it in items]).astype(np.float32),
                   np.stack([it["gt_seg"] for it in items]).astype(np.int32))


class SyntheticTextSeg:
    """Random 'text-like' rectangles/strings on noisy backgrounds with
    exact masks — hermetic stand-in for TextSeg/TotalText."""

    def __init__(self, num_samples: int = 32, size: Tuple[int, int] = (64, 64),
                 pipeline: Optional[Sequence] = None, seed: int = 0):
        self.num_samples = num_samples
        self.size = size
        self.pipeline = Compose(pipeline) if pipeline else None
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Sample:
        rng = np.random.default_rng(self.seed * 9973 + idx)
        h, w = self.size
        img = Image.new("RGB", (w, h),
                        tuple(int(v) for v in rng.integers(100, 255, 3)))
        mask = Image.new("L", (w, h), 0)
        d_img, d_mask = ImageDraw.Draw(img), ImageDraw.Draw(mask)
        for _ in range(int(rng.integers(1, 4))):
            x0, y0 = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
            text = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 4))
            color = tuple(int(v) for v in rng.integers(0, 80, 3))
            d_img.text((x0, y0), text, fill=color)
            d_mask.text((x0, y0), text, fill=1)
        arr = np.asarray(img, np.uint8)
        noise = rng.normal(0, 5, arr.shape)
        arr = np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        sample = {"img": arr, "gt_seg": np.asarray(mask, np.uint8)}
        if self.pipeline:
            sample = self.pipeline(sample)
        return sample

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0):
        for s in range(0, len(self) - batch_size + 1, batch_size):
            items = [self[i] for i in range(s, s + batch_size)]
            yield (np.stack([it["img"] for it in items]).astype(np.float32),
                   np.stack([it["gt_seg"] for it in items]).astype(np.int32))
