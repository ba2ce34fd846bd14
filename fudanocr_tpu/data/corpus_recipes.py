"""Per-corpus LMDB creation recipes.

Parameterized equivalents of scene-text-telescope/dataset/create_lmdb.py's
hard-coded-path scripts (:236-534): each recipe enumerates one corpus
layout, applies the reference's size filters, and writes the same LMDB
key schema ('image-%09d'/'label-%09d'/'num-samples'; the detection
variant adds 'boxes_x-'/'boxes_y-'/'region_mask-'/'pixel_mask-',
create_lmdb.py:69-127). crop_words mirrors crop_800k.py's
polygon->rect word cropping.

CLI: python -m fudanocr_tpu.data.corpus_recipes <recipe> [args...]
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

from PIL import Image

from fudanocr_tpu.data.lmdb_store import LMDBWriter


def _write_samples(out_path: str, samples: Iterable[Tuple[bytes, dict]],
                   log_every: int = 1000) -> int:
    """samples: (image_bytes, {key_suffix: bytes}) -> reference key schema."""
    writer = LMDBWriter(out_path)
    n = 0
    for image_bin, extra in samples:
        n += 1
        writer.put(b"image-%09d" % n, image_bin)
        for suffix, data in extra.items():
            writer.put(b"%s-%09d" % (suffix.encode(), n), data)
        if n % log_every == 0:
            print(f"collected {n}")
    writer.put(b"num-samples", str(n).encode())
    writer.write()
    print(f"created dataset with {n} samples at {out_path}")
    return n


def _valid_image(path: str) -> Optional[Image.Image]:
    try:
        return Image.open(path)
    except OSError:
        return None


def create_800k(odgt_path: str, out_path: str, min_h: int = 64,
                min_w: int = 256) -> int:
    """SynthText crops from an .odgt json-lines manifest
    (create_lmdb.py:236-270: keep h>=64 and w>=256)."""
    def gen():
        for line in open(odgt_path):
            rec = json.loads(line)
            path = os.path.join(rec["im_path"], rec["im_name"])
            img = _valid_image(path)
            if img is None:
                continue
            w, h = img.size
            if h >= min_h and w >= min_w:
                yield open(path, "rb").read(), {
                    "label": rec["label"].encode()}
    return _write_samples(out_path, gen())


def create_90k(root: str, out_path: str, min_w: int = 100,
               min_h: int = 31) -> int:
    """MJSynth 90kDICT32px tree; label parsed from `*_LABEL_*` filenames
    (create_lmdb.py:370-406: keep w>=100 and h>=31)."""
    def gen():
        for d1 in sorted(os.listdir(root)):
            p1 = os.path.join(root, d1)
            if "." in d1 or not os.path.isdir(p1):
                continue
            for d2 in sorted(os.listdir(p1)):
                p2 = os.path.join(p1, d2)
                if not os.path.isdir(p2):
                    continue
                for fname in sorted(os.listdir(p2)):
                    path = os.path.join(p2, fname)
                    img = _valid_image(path)
                    if img is None:
                        continue
                    w, h = img.size
                    if w >= min_w and h >= min_h:
                        label = fname.split("_")[1]
                        yield open(path, "rb").read(), {
                            "label": label.encode()}
    return _write_samples(out_path, gen())


def create_ic(odgt_path: str, out_dir: str, image_root: str = "") -> dict:
    """ICDAR13/15 train/test LMDBs from one .odgt routing manifest with
    `dataset` and `type` fields (create_lmdb.py:408-460)."""
    buckets: dict = {}
    for line in open(odgt_path):
        rec = json.loads(line)
        name = rec["img_path"]
        if image_root:
            name = os.path.join(image_root, os.path.basename(name))
        if not os.path.exists(name) or _valid_image(name) is None:
            continue
        key = f"{rec['dataset'].lower()}_{rec['type']}"
        buckets.setdefault(key, []).append((name, rec["img_gt"]))
    counts = {}
    for key, items in buckets.items():
        out = os.path.join(out_dir, key)
        counts[key] = _write_samples(
            out, ((open(p, "rb").read(), {"label": l.encode()})
                  for p, l in items))
    return counts


def create_gt_txt(root: str, out_path: str, gt_file: str = "gt.txt") -> int:
    """SVT-Perspective-style `name label` gt.txt corpora
    (create_lmdb.py:462-477)."""
    def gen():
        for line in open(os.path.join(root, gt_file)):
            parts = line.split()
            if len(parts) < 2:
                continue
            name, label = parts[0], parts[1].strip()
            path = os.path.join(root, name)
            if os.path.exists(path) and _valid_image(path) is not None:
                yield open(path, "rb").read(), {"label": label.encode()}
    return _write_samples(out_path, gen())


def create_detection(out_path: str, image_paths: Sequence[str],
                     boxes_x: Sequence[str], boxes_y: Sequence[str],
                     labels: Optional[Sequence[str]] = None,
                     region_masks: Optional[Sequence[str]] = None,
                     pixel_masks: Optional[Sequence[str]] = None) -> int:
    """Detection-layout LMDB (TotalText/IIIT5K variants,
    create_lmdb.py:69-127): per-sample polygon coordinate strings plus
    optional region/pixel mask images."""
    def gen():
        for i, path in enumerate(image_paths):
            if not boxes_x[i] or not os.path.exists(path):
                continue
            extra = {"boxes_x": boxes_x[i].encode(),
                     "boxes_y": boxes_y[i].encode()}
            if labels:
                extra["label"] = labels[i].encode()
            if region_masks:
                extra["region_mask"] = open(region_masks[i], "rb").read()
            if pixel_masks:
                extra["pixel_mask"] = open(pixel_masks[i], "rb").read()
            yield open(path, "rb").read(), extra
    return _write_samples(out_path, gen())


def crop_words(img: Image.Image, polygons: Sequence[Sequence[Tuple[float,
               float]]]) -> List[Image.Image]:
    """Axis-aligned word crops from polygon annotations — the geometry of
    crop_800k.py:37-60 (polygon -> bounding rect -> crop)."""
    crops = []
    for poly in polygons:
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        x0, x1 = math.floor(min(xs)), math.ceil(max(xs))
        y0, y1 = math.floor(min(ys)), math.ceil(max(ys))
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, img.size[0]), min(y1, img.size[1])
        if x1 > x0 and y1 > y0:
            crops.append(img.crop((x0, y0, x1, y1)))
    return crops


RECIPES = {
    "800k": (create_800k, ("odgt_path", "out_path")),
    "90k": (create_90k, ("root", "out_path")),
    "ic": (create_ic, ("odgt_path", "out_dir")),
    "gt_txt": (create_gt_txt, ("root", "out_path")),
}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="per-corpus LMDB builders")
    p.add_argument("recipe", choices=sorted(RECIPES))
    p.add_argument("args", nargs="+")
    ns = p.parse_args(argv)
    fn, names = RECIPES[ns.recipe]
    print(fn(*ns.args))


if __name__ == "__main__":
    main()
