"""Recognition datasets: LMDB char/text images + synthetic generator.

Equivalent of the CTR projects' lmdbReader (stroke-level-decomposition/
data/lmdbReader.py:13-90): 'image-%09d'/'label-%09d' keys, skip-if-not-in-
alphabet, resize to a square canvas, [-1, 1] normalisation.
"""

from __future__ import annotations

import io
import random
import string
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from fudanocr_tpu.data.lmdb_store import LMDBReader


def str_q2b(s: str) -> str:
    """Full-width -> half-width normalisation (image-ids-CTR lmdbReader's
    strQ2B): ideographic space U+3000 -> space, FF01-FF5E -> ASCII."""
    out = []
    for ch in s:
        code = ord(ch)
        if code == 0x3000:
            code = 32
        elif 0xFF01 <= code <= 0xFF5E:
            code -= 0xFEE0
        out.append(chr(code))
    return "".join(out)


def random_sequential_order(n: int, batch_size: int, seed: int = 0):
    """randomSequentialSampler (dataset.py:205-228): each batch is a random
    CONTIGUOUS run of indices — sequential LMDB reads with random starts."""
    rng = random.Random(seed)
    order = []
    n_batch, tail = divmod(n, batch_size)
    for _ in range(n_batch):
        start = rng.randint(0, n - batch_size)
        order.extend(range(start, start + batch_size))
    if tail:
        start = rng.randint(0, n - batch_size)
        order.extend(range(start, start + tail))
    return order


class RecLMDBDataset:
    def __init__(self, roots, image_size: Tuple[int, int] = (32, 32),
                 alphabet: Optional[str] = None):
        if isinstance(roots, str):
            roots = [roots]
        self.readers = [LMDBReader(r) for r in roots]
        self.counts = [int(r.get(b"num-samples") or 0) for r in self.readers]
        self.image_size = image_size
        self.alphabet = set(alphabet) if alphabet else None

    def __len__(self):
        return sum(self.counts)

    def _locate(self, index):
        for reader, count in zip(self.readers, self.counts):
            if index < count:
                return reader, index + 1
            index -= count
        raise IndexError(index)

    def __getitem__(self, index):
        reader, i = self._locate(index)
        label = (reader.get(b"label-%09d" % i) or b"").decode()
        img = Image.open(io.BytesIO(reader.get(b"image-%09d" % i)))
        img = img.convert("RGB").resize(
            (self.image_size[1], self.image_size[0]), Image.BICUBIC)
        # [-1, 1] normalisation (lmdbReader.py resizeNormalize)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        return arr, label

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0):
        order = list(range(len(self)))
        if shuffle:
            random.Random(seed).shuffle(order)
        for start in range(0, len(self) - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            samples = [self[i] for i in idx]
            if self.alphabet is not None:
                samples = [(a, l) for a, l in samples
                           if all(ch in self.alphabet for ch in l)]
                while len(samples) < batch_size and samples:
                    samples.append(samples[-1])
            if not samples:
                continue
            images = np.stack([a for a, _ in samples])
            labels = [l for _, l in samples]
            yield images, labels


class OrientationLMDBDataset(RecLMDBDataset):
    """OI-CTR reader (orientation-independent-CTR/data/lmdbReader.py:80-133):
    aspect-ratio rule 1.5*w >= h -> horizontal (is_v=0), else vertical
    (is_v=1, rotated 90° into the horizontal frame). Batches yield
    (images, labels, is_v)."""

    def __getitem__(self, index):
        reader, i = self._locate(index)
        label = (reader.get(b"label-%09d" % i) or b"").decode()
        img = Image.open(io.BytesIO(reader.get(b"image-%09d" % i)))
        img = img.convert("RGB")
        w, h = img.size
        is_v = 0 if 1.5 * w >= h else 1
        if is_v:
            img = img.transpose(Image.ROTATE_90)
        img = img.resize((self.image_size[1], self.image_size[0]),
                         Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        return arr, label, is_v

    def batches(self, batch_size: int, **_):
        for start in range(0, len(self) - batch_size + 1, batch_size):
            samples = [self[i] for i in range(start, start + batch_size)]
            yield (np.stack([a for a, _, _ in samples]),
                   [l for _, l, _ in samples],
                   np.asarray([v for _, _, v in samples], np.int32))


class SyntheticCharDataset:
    """Hermetic stand-in for the font-rendered char LMDBs: renders single
    'characters' (latin glyphs as proxies) on noisy canvases."""

    def __init__(self, charset: Optional[str] = None, num_samples: int = 128,
                 image_size: Tuple[int, int] = (32, 32), seed: int = 0):
        self.charset = charset or (string.ascii_uppercase + string.digits)
        self.image_size = image_size
        rng = random.Random(seed)
        self.labels = [rng.choice(self.charset) for _ in range(num_samples)]
        self.seed = seed

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index):
        label = self.labels[index]
        rng = np.random.default_rng(self.seed * 7919 + index)
        h, w = self.image_size
        img = Image.new("RGB", (w * 2, h * 2), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        draw.text((int(rng.integers(4, w)), int(rng.integers(2, h // 2))),
                  label, fill=(0, 0, 0))
        img = img.resize((w, h), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        arr += rng.normal(0, 0.02, arr.shape).astype(np.float32)
        return arr, label

    def batches(self, batch_size: int, **_):
        for start in range(0, len(self) - batch_size + 1, batch_size):
            samples = [self[i] for i in range(start, start + batch_size)]
            yield (np.stack([a for a, _ in samples]),
                   [l for _, l in samples])
