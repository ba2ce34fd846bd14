"""Segmentation datasets: directory-scan (CustomDataset) + synthetic.

Rebuild of mmseg/datasets/custom.py:19-403 (img_dir/ann_dir scan with
suffix pairing, pipeline application, iteration) and the `_Det` dataset
family (textseg.py:41,120,366,444,527: det_dir/det_suffix, det file =
image name with the det suffix, injected as det_prefix), plus a hermetic
synthetic text-segmentation generator for tests/smoke training.

Batches are dicts of stacked arrays with STATIC batch size: the final
partial batch is padded by repeating its last sample and a per-sample
`valid` mask marks the padding, so eval covers every image exactly once
(the reference iterates the full dataset, mmseg/apis/test.py) while
keeping shapes jit-stable.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from fudanocr_tpu.data.seg_pipeline import Compose, Sample


def _stack_batch(items: List[Sample], valid: np.ndarray) -> Dict:
    batch = {
        "img": np.stack([it["img"] for it in items]).astype(np.float32),
        "gt_seg": np.stack([it["gt_seg"] for it in items]).astype(np.int32),
        "valid": valid,
    }
    if all("gt_det" in it for it in items):
        batch["gt_det"] = np.stack(
            [it["gt_det"] for it in items]).astype(np.int32)
    return batch


def _batches_from(getitem, n: int, batch_size: int, shuffle: bool,
                  seed: int, drop_last: bool) -> Iterator[Dict]:
    order = list(range(n))
    if shuffle:
        random.Random(seed).shuffle(order)
    for s in range(0, n, batch_size):
        idxs = order[s:s + batch_size]
        if len(idxs) < batch_size and drop_last:
            break
        valid = np.zeros((batch_size,), np.float32)
        valid[:len(idxs)] = 1.0
        while len(idxs) < batch_size:  # pad by repeating the last sample
            idxs.append(idxs[-1])
        yield _stack_batch([getitem(i) for i in idxs], valid)


class SegDataset:
    """Scan img_dir/ann_dir (and optionally det_dir) for per-image
    (image, annotation[, det-mask]) tuples and run the pipeline. `split`
    optionally lists basenames to keep."""

    def __init__(self, img_dir: str, ann_dir: str,
                 pipeline: Sequence, img_suffix: str = ".jpg",
                 seg_suffix: str = ".png",
                 det_dir: Optional[str] = None, det_suffix: str = ".png",
                 split: Optional[str] = None):
        self.img_dir = img_dir
        self.ann_dir = ann_dir
        self.det_dir = det_dir
        self.pipeline = Compose(pipeline)
        names = sorted(
            f[:-len(img_suffix)] for f in os.listdir(img_dir)
            if f.endswith(img_suffix))
        if split:
            keep = {l.strip() for l in open(split)}
            names = [n for n in names if n in keep]
        def det_path(n):
            # tolerate partial det coverage: a missing det mask degrades
            # that sample to the plain (no det-loss) path instead of
            # crashing LoadAnnotations with FileNotFoundError
            if not det_dir:
                return None
            p = os.path.join(det_dir, n + det_suffix)
            return p if os.path.exists(p) else None

        self.samples = [
            (os.path.join(img_dir, n + img_suffix),
             os.path.join(ann_dir, n + seg_suffix),
             det_path(n))
            for n in names]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Sample:
        img_path, seg_path, det_path = self.samples[idx]
        sample = {"img_path": img_path, "seg_path": seg_path}
        if det_path:
            sample["det_path"] = det_path
        return self.pipeline(sample)

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = False) -> Iterator[Dict]:
        return _batches_from(self.__getitem__, len(self), batch_size,
                             shuffle, seed, drop_last)


class SyntheticTextSeg:
    """Random 'text-like' rectangles/strings on noisy backgrounds with
    exact masks — hermetic stand-in for TextSeg/TotalText. `with_det=True`
    adds a coarse det mask (the text mask dilated to word boxes), standing
    in for the `_Det` datasets' separate detection annotations."""

    def __init__(self, num_samples: int = 32, size: Tuple[int, int] = (64, 64),
                 pipeline: Optional[Sequence] = None, seed: int = 0,
                 with_det: bool = False):
        self.num_samples = num_samples
        self.size = size
        self.pipeline = Compose(pipeline) if pipeline else None
        self.seed = seed
        self.with_det = with_det

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Sample:
        rng = np.random.default_rng(self.seed * 9973 + idx)
        h, w = self.size
        img = Image.new("RGB", (w, h),
                        tuple(int(v) for v in rng.integers(100, 255, 3)))
        mask = Image.new("L", (w, h), 0)
        det = Image.new("L", (w, h), 0)
        d_img, d_mask = ImageDraw.Draw(img), ImageDraw.Draw(mask)
        d_det = ImageDraw.Draw(det)
        for _ in range(int(rng.integers(1, 4))):
            x0, y0 = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
            text = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 4))
            color = tuple(int(v) for v in rng.integers(0, 80, 3))
            d_img.text((x0, y0), text, fill=color)
            d_mask.text((x0, y0), text, fill=1)
            box = d_det.textbbox((x0, y0), text)
            d_det.rectangle(box, fill=1)
        arr = np.asarray(img, np.uint8)
        noise = rng.normal(0, 5, arr.shape)
        arr = np.clip(arr.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        sample = {"img": arr, "gt_seg": np.asarray(mask, np.uint8)}
        if self.with_det:
            sample["gt_det"] = np.asarray(det, np.uint8)
        if self.pipeline:
            sample = self.pipeline(sample)
        return sample

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = False) -> Iterator[Dict]:
        return _batches_from(self.__getitem__, len(self), batch_size,
                             shuffle, seed, drop_last)
