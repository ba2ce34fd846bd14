"""Synthetic TextZoom-style dataset for tests, smoke training, and benches.

The reference has no test fixtures at all (SURVEY.md §4); this generator
renders random lowercase/digit strings with PIL onto noisy backgrounds and
produces (HR, LR, label) triples with the TextZoom geometry so every
trainer/eval path can run hermetically.
"""

from __future__ import annotations

import random
import string
from typing import List, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFilter


class SyntheticTextZoom:
    """Deterministic synthetic paired SR dataset."""

    def __init__(self, num_samples: int = 256, seed: int = 0,
                 hr_size: Tuple[int, int] = (128, 32),
                 scale: int = 2, max_label_len: int = 8):
        self.num_samples = num_samples
        self.hr_size = hr_size
        self.scale = scale
        rng = random.Random(seed)
        alphabet = string.ascii_lowercase + string.digits
        self.labels = [
            "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(3, max_label_len)))
            for _ in range(num_samples)
        ]
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int):
        label = self.labels[idx]
        rng = np.random.default_rng(self.seed * 100003 + idx)
        w, h = self.hr_size
        bg = rng.integers(120, 255)
        fg = rng.integers(0, 100)
        img = Image.new("RGB", (w, h), (int(bg),) * 3)
        draw = ImageDraw.Draw(img)
        draw.text((4 + int(rng.integers(0, 8)), 4 + int(rng.integers(0, 8))),
                  label, fill=(int(fg),) * 3)
        noise = rng.normal(0, 6, (h, w, 3))
        arr = np.clip(np.asarray(img, dtype=np.float32) + noise, 0, 255)
        hr = Image.fromarray(arr.astype(np.uint8))
        lr = hr.resize((w // self.scale, h // self.scale), Image.BICUBIC)
        lr = lr.filter(ImageFilter.GaussianBlur(0.6))
        return hr, lr, label

    def batches(self, batch_size: int, **collate_kw):
        from fudanocr_tpu.data.collate import sr_collate
        for start in range(0, len(self) - batch_size + 1, batch_size):
            yield sr_collate([self[i] for i in range(start, start + batch_size)],
                             **collate_kw)
