"""LMDB-backed datasets (TextZoom et al.).

Equivalents of scene-text-telescope/dataset/dataset.py:50-204:
`LMDBDataset` (HR-only, 'image-%09d', LR synthesized by bicubic down-
sampling), `PairedLMDBDataset` ('image_hr-%09d'/'image_lr-%09d' pairs) and
the mix variant. Keys follow the reference layout with 1-based indices and
a 'num-samples' count. Decoding (JPEG/PNG via PIL) happens on host worker
threads; batches come out as fixed-shape NHWC float arrays.
"""

from __future__ import annotations

import io
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from fudanocr_tpu.data.lmdb_store import LMDBReader
from fudanocr_tpu.eval.metrics import str_filt


def _decode(buf: bytes, mode: str = "RGB") -> Image.Image:
    return Image.open(io.BytesIO(buf)).convert(mode)


class _LMDBBase:
    def __init__(self, roots, voc_type: str = "upper", max_len: int = 100,
                 batch_hw=(32, 128), scale: int = 2):
        if isinstance(roots, str):
            roots = [roots]
        self.readers = [LMDBReader(r) for r in roots]
        self.counts = [int(r.get(b"num-samples") or 0) for r in self.readers]
        self.voc_type = voc_type
        self.max_len = max_len
        self.batch_hw = batch_hw
        self.scale = scale

    def __len__(self):
        return sum(self.counts)

    def _locate(self, index: int):
        for reader, count in zip(self.readers, self.counts):
            if index < count:
                return reader, index + 1  # keys are 1-based
            index -= count
        raise IndexError(index)

    def fetch_items(self, indices: Sequence[int]) -> List:
        """Items for a batch of indices. Subclasses with a batched native
        read path override this; the default is per-item __getitem__."""
        return [self[i] for i in indices]

    def collate(self, items, **collate_kw):
        from fudanocr_tpu.data.collate import sr_collate
        kw = dict(img_h=self.batch_hw[0], img_w=self.batch_hw[1],
                  down_sample_scale=self.scale)
        kw.update(collate_kw)
        return sr_collate(items, **kw)

    def batches(self, batch_size: int, **collate_kw):
        for start in range(0, len(self) - batch_size + 1, batch_size):
            yield self.collate(
                self.fetch_items(range(start, start + batch_size)),
                **collate_kw)


class LMDBDataset(_LMDBBase):
    """HR-only LMDB; LR is synthesized at collate time (lmdbDataset +
    alignCollate_syn)."""

    def __getitem__(self, index: int):
        reader, i = self._locate(index)
        label = (reader.get(b"label-%09d" % i) or b"").decode()
        buf = reader.get(b"image_hr-%09d" % i) or reader.get(b"image-%09d" % i)
        img = _decode(buf)
        lr = img.resize((img.size[0] // self.scale, img.size[1] // self.scale),
                        Image.BICUBIC)
        return img, lr, str_filt(label, self.voc_type)


class PairedLMDBDataset(_LMDBBase):
    """Real paired HR/LR LMDB (lmdbDataset_real)."""

    def __getitem__(self, index: int):
        reader, i = self._locate(index)
        label = (reader.get(b"label-%09d" % i) or b"").decode()
        hr = _decode(reader.get(b"image_hr-%09d" % i))
        lr = _decode(reader.get(b"image_lr-%09d" % i))
        return hr, lr, str_filt(label, self.voc_type)

    def fetch_items(self, indices: Sequence[int]) -> List:
        """Batched read: the whole batch's hr/lr/label lookups go through
        ONE native get_many call per reader (lmdb_get_ptrs), replacing
        3*B FFI crossings with at most one per reader."""
        located = [self._locate(i) for i in indices]
        by_reader: dict = {}
        for pos, (reader, i) in enumerate(located):
            by_reader.setdefault(id(reader), (reader, []))[1].append((pos, i))
        vals: List = [None] * (3 * len(indices))
        for reader, entries in by_reader.values():
            keys = []
            for _, i in entries:
                keys += [b"image_hr-%09d" % i, b"image_lr-%09d" % i,
                         b"label-%09d" % i]
            got = reader.get_many(keys)
            for j, (pos, _) in enumerate(entries):
                vals[3 * pos:3 * pos + 3] = got[3 * j:3 * j + 3]
        out = []
        for pos in range(len(indices)):
            hr_buf, lr_buf, label = vals[3 * pos:3 * pos + 3]
            out.append((_decode(hr_buf), _decode(lr_buf),
                        str_filt((label or b"").decode(), self.voc_type)))
        return out


class LRServingLMDBDataset(PairedLMDBDataset):
    """LR-only view of a paired LMDB for the SERVING pipeline.

    The serving hot path (LMDB -> SR -> CRNN -> strings) never looks at
    the HR image — decoding it anyway halves the host loader on a
    decode-bound host. Items are (lr, label); collate produces ONE
    (B, h, w, C) batch (uint8 by default: normalization runs on device,
    data/collate.py::normalize_uint8). Training keeps PairedLMDBDataset.
    """

    def fetch_items(self, indices):
        located = [self._locate(i) for i in indices]
        by_reader: dict = {}
        for pos, (reader, i) in enumerate(located):
            by_reader.setdefault(id(reader), (reader, []))[1].append((pos, i))
        vals = [None] * (2 * len(indices))
        for reader, entries in by_reader.values():
            keys = []
            for _, i in entries:
                keys += [b"image_lr-%09d" % i, b"label-%09d" % i]
            got = reader.get_many(keys)
            for j, (pos, _) in enumerate(entries):
                vals[2 * pos:2 * pos + 2] = got[2 * j:2 * j + 2]
        out = []
        for pos in range(len(indices)):
            lr_buf, label = vals[2 * pos:2 * pos + 2]
            out.append((_decode(lr_buf),
                        str_filt((label or b"").decode(), self.voc_type)))
        return out

    def collate(self, items, dtype=None, **kw):
        import numpy as np

        from fudanocr_tpu.data.collate import resize_normalize
        dtype = np.uint8 if dtype is None else dtype
        h, w = self.batch_hw
        lr_size = (w // self.scale, h // self.scale)
        lrs = [resize_normalize(img, lr_size, dtype=dtype)
               for img, _ in items]
        return np.stack(lrs), [lab for _, lab in items]


class MixLMDBDataset(_LMDBBase):
    """lmdbDataset_mix (dataset.py:155-202): at train time the LR image is
    the stored LR with probability 0.5, else the HR itself; at test time
    falls back to HR-only entries when no pair exists."""

    def __init__(self, *args, test: bool = False, seed: int = 0, **kw):
        super().__init__(*args, **kw)
        self.test = test
        import random as _random
        self._rng = _random.Random(seed)

    def __getitem__(self, index: int):
        reader, i = self._locate(index)
        label = (reader.get(b"label-%09d" % i) or b"").decode()
        hr_buf = reader.get(b"image_hr-%09d" % i)
        lr_buf = reader.get(b"image_lr-%09d" % i)
        if hr_buf is None:
            hr_buf = reader.get(b"image-%09d" % i)
            lr_buf = None
        hr = _decode(hr_buf)
        if self.test:
            lr = _decode(lr_buf) if lr_buf else hr
        else:
            lr = (_decode(lr_buf)
                  if lr_buf and self._rng.random() < 0.5 else hr)
        return hr, lr, str_filt(label, self.voc_type)


def create_dataset(out_path: str, samples, quality: int = 95) -> int:
    """createDataset equivalent (create_lmdb.py:184-233): write (hr_image,
    lr_image_or_None, label) triples into a new LMDB. Returns sample count."""
    from fudanocr_tpu.data.lmdb_store import LMDBWriter

    writer = LMDBWriter(out_path)
    n = 0
    for item in samples:
        hr, lr, label = item
        n += 1

        def enc(img):
            b = io.BytesIO()
            img.save(b, format="JPEG", quality=quality)
            return b.getvalue()

        writer.put(b"image_hr-%09d" % n, enc(hr))
        if lr is not None:
            writer.put(b"image_lr-%09d" % n, enc(lr))
        writer.put(b"label-%09d" % n, label.encode())
    writer.put(b"num-samples", str(n).encode())
    writer.write()
    return n
