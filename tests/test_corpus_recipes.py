"""Per-corpus LMDB recipes vs tiny synthetic corpora on disk."""

import json
import os

import numpy as np
from PIL import Image


def _img(path, w=260, h=70, color=(90, 90, 90)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (w, h), color).save(path)
    return path


def _read_all(lmdb_path):
    from fudanocr_tpu.data.lmdb_store import LMDBReader

    r = LMDBReader(lmdb_path)
    n = int(r.get(b"num-samples"))
    return r, n


def test_create_90k_layout_and_filters(tmp_path):
    from fudanocr_tpu.data.corpus_recipes import create_90k

    root = tmp_path / "90k"
    _img(str(root / "1" / "2" / "10_hello_4.jpg"))
    _img(str(root / "1" / "2" / "11_world_5.jpg"))
    # too small -> filtered (reference keeps w>=100 and h>=31)
    _img(str(root / "1" / "3" / "12_tiny_6.jpg"), w=50, h=20)
    out = tmp_path / "out90k"
    n = create_90k(str(root), str(out))
    assert n == 2
    r, n2 = _read_all(str(out))
    assert n2 == 2
    labels = sorted(r.get(b"label-%09d" % i).decode() for i in (1, 2))
    assert labels == ["hello", "world"]
    Image.open(__import__("io").BytesIO(r.get(b"image-%09d" % 1)))


def test_create_800k_odgt_and_gt_txt(tmp_path):
    from fudanocr_tpu.data.corpus_recipes import create_800k, create_gt_txt

    imdir = tmp_path / "ims"
    _img(str(imdir / "a.jpg"))                 # 260x70 passes
    _img(str(imdir / "b.jpg"), w=100, h=30)    # filtered: h < 64
    odgt = tmp_path / "m.odgt"
    odgt.write_text("\n".join(
        json.dumps({"im_path": str(imdir), "im_name": n, "label": l})
        for n, l in (("a.jpg", "alpha"), ("b.jpg", "beta"))))
    out = tmp_path / "out800k"
    assert create_800k(str(odgt), str(out)) == 1
    r, _ = _read_all(str(out))
    assert r.get(b"label-%09d" % 1) == b"alpha"

    # svt-style gt.txt corpus
    root = tmp_path / "svt"
    _img(str(root / "im1.jpg"))
    (root / "gt.txt").write_text("im1.jpg SVTP\n")
    out2 = tmp_path / "outsvt"
    assert create_gt_txt(str(root), str(out2)) == 1
    r2, _ = _read_all(str(out2))
    assert r2.get(b"label-%09d" % 1) == b"SVTP"


def test_create_detection_layout_and_crop_words(tmp_path):
    from fudanocr_tpu.data.corpus_recipes import create_detection, crop_words

    p = _img(str(tmp_path / "d.jpg"), w=100, h=60)
    mask = _img(str(tmp_path / "m.png"), w=100, h=60, color=(255, 255, 255))
    out = tmp_path / "outdet"
    n = create_detection(str(out), [p], ["1,40,40,1"], ["1,1,30,30"],
                         labels=["word"], pixel_masks=[mask])
    assert n == 1
    r, _ = _read_all(str(out))
    assert r.get(b"boxes_x-%09d" % 1) == b"1,40,40,1"
    assert r.get(b"label-%09d" % 1) == b"word"
    assert r.get(b"pixel_mask-%09d" % 1)

    img = Image.new("RGB", (100, 60))
    crops = crop_words(img, [[(10.5, 5.2), (40, 5), (40, 20), (10, 20)],
                             [(95, 50), (120, 50), (120, 80), (95, 80)]])
    assert crops[0].size == (30, 15)   # floor/ceil rect of the polygon
    assert crops[1].size == (5, 10)    # clamped to the image border
