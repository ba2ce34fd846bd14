"""Dataset-creation tools (create_lmdb.py:184-534 equivalents).

The reference ships one `createDataset` plus per-corpus wrappers
(create_800k / create_90k / ICDAR / TotalText / SVT / detection and
inpainting variants) that mostly differ in how they enumerate (image,
label) pairs. Here: one generic builder over an iterator of samples plus
enumeration helpers for the common corpus layouts.
"""

from __future__ import annotations

import io
import os
from typing import Iterable, Iterator, Optional, Tuple

from PIL import Image

from fudanocr_tpu.data.lmdb_store import LMDBWriter


def create_recognition_dataset(out_path: str,
                               samples: Iterable[Tuple[Image.Image, str]],
                               quality: int = 95,
                               check_valid: bool = True) -> int:
    """(image, label) pairs -> 'image-%09d'/'label-%09d' LMDB."""
    writer = LMDBWriter(out_path)
    n = 0
    for img, label in samples:
        if check_valid and (img.size[0] < 2 or img.size[1] < 2):
            continue
        n += 1
        buf = io.BytesIO()
        img.convert("RGB").save(buf, format="JPEG", quality=quality)
        writer.put(b"image-%09d" % n, buf.getvalue())
        writer.put(b"label-%09d" % n, label.encode("utf-8"))
    writer.put(b"num-samples", str(n).encode())
    writer.write()
    return n


def create_sr_dataset(out_path: str,
                      samples: Iterable[Tuple[Image.Image,
                                              Optional[Image.Image], str]],
                      quality: int = 95) -> int:
    """(hr, lr?, label) triples -> paired TextZoom-layout LMDB."""
    from fudanocr_tpu.data.lmdb_dataset import create_dataset

    return create_dataset(out_path, samples, quality)


def iter_imagedir_with_labelfile(img_dir: str, label_file: str,
                                 sep: str = " ") -> Iterator:
    """Corpus layout: a label file with `filename<sep>label` lines (the
    90k/800k synth layout)."""
    with open(label_file, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            fname, _, label = line.partition(sep)
            path = os.path.join(img_dir, fname)
            if os.path.exists(path):
                yield Image.open(path), label


def iter_gt_pairs(img_dir: str, gt_dir: str,
                  img_suffix: str = ".jpg", gt_suffix: str = ".txt"
                  ) -> Iterator:
    """Corpus layout: per-image gt text files (ICDAR-style)."""
    for fname in sorted(os.listdir(img_dir)):
        if not fname.endswith(img_suffix):
            continue
        gt = os.path.join(gt_dir, fname[:-len(img_suffix)] + gt_suffix)
        if os.path.exists(gt):
            label = open(gt, encoding="utf-8").read().strip()
            yield Image.open(os.path.join(img_dir, fname)), label
