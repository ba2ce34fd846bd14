"""LMDB store: write -> read roundtrips incl. overflow pages, ordered scan,
and the TextZoom dataset layer on top."""

import io
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from fudanocr_tpu.data.lmdb_store import LMDBReader, LMDBWriter, PAGE_SIZE
from fudanocr_tpu.data.lmdb_dataset import (PairedLMDBDataset, LMDBDataset,
                                            create_dataset)


def test_roundtrip_small_and_overflow_values():
    rng = np.random.default_rng(0)
    data = {}
    for i in range(500):
        data[b"key-%06d" % i] = bytes(rng.integers(0, 256,
                                                   rng.integers(1, 100),
                                                   dtype=np.uint8))
    # large values -> overflow pages (multi-page too)
    data[b"big-1"] = bytes(rng.integers(0, 256, PAGE_SIZE * 3 + 17,
                                        dtype=np.uint8))
    data[b"big-2"] = bytes(rng.integers(0, 256, PAGE_SIZE - 10,
                                        dtype=np.uint8))

    with tempfile.TemporaryDirectory() as tmp:
        w = LMDBWriter(os.path.join(tmp, "db"))
        w.update(data)
        w.write()

        with LMDBReader(os.path.join(tmp, "db")) as r:
            assert len(r) == len(data)
            for k, v in data.items():
                assert r.get(k) == v, k
            assert r.get(b"missing") is None
            # ordered scan
            items = list(r.items())
            assert [k for k, _ in items] == sorted(data.keys())


def test_multilevel_btree():
    """Enough keys to force >=2 branch levels."""
    data = {b"%012d" % i: b"v" * 50 for i in range(20000)}
    with tempfile.TemporaryDirectory() as tmp:
        w = LMDBWriter(os.path.join(tmp, "db"))
        w.update(data)
        w.write()
        with LMDBReader(os.path.join(tmp, "db")) as r:
            assert r.main["depth"] >= 3
            for i in (0, 1, 9999, 19999, 12345):
                assert r.get(b"%012d" % i) == b"v" * 50


def test_textzoom_dataset_roundtrip():
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom

    syn = SyntheticTextZoom(num_samples=8, hr_size=(64, 16))
    samples = [syn[i] for i in range(8)]
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "textzoom")
        n = create_dataset(path, samples)
        assert n == 8

        ds = PairedLMDBDataset(path, voc_type="lower",
                               batch_hw=(16, 64), scale=2)
        assert len(ds) == 8
        hr, lr, label = ds[3]
        assert hr.size == (64, 16) and lr.size == (32, 8)
        assert label == syn.labels[3]

        hr_b, lr_b, labels = next(ds.batches(4))
        assert hr_b.shape == (4, 16, 64, 3) and lr_b.shape == (4, 8, 32, 3)
        assert labels[0] == syn.labels[0]


def test_native_reader_agrees_with_python():
    """C++ reader (if built) returns byte-identical values to the Python
    parser, including overflow values."""
    from fudanocr_tpu.data.lmdb_store import _load_native

    if _load_native() is None:
        pytest.skip("native lmdb reader not built")

    rng = np.random.default_rng(42)
    data = {b"k%05d" % i: bytes(rng.integers(0, 256, int(rng.integers(1, 80)),
                                             dtype=np.uint8))
            for i in range(300)}
    data[b"zbig"] = bytes(rng.integers(0, 256, PAGE_SIZE * 2 + 5,
                                       dtype=np.uint8))
    with tempfile.TemporaryDirectory() as tmp:
        w = LMDBWriter(os.path.join(tmp, "db"))
        w.update(data)
        w.write()
        nat = LMDBReader(os.path.join(tmp, "db"), use_native=True)
        py = LMDBReader(os.path.join(tmp, "db"), use_native=False)
        assert nat._native is not None, "native path did not engage"
        for k, v in data.items():
            assert nat.get(k) == v == py.get(k)
        assert nat.get(b"nope") is None
        assert int(nat._native.lmdb_entries(nat._native_env)) == len(data)
        nat.close(); py.close()


def test_mix_dataset_modes():
    from fudanocr_tpu.data.lmdb_dataset import MixLMDBDataset
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom

    syn = SyntheticTextZoom(num_samples=6, hr_size=(64, 16))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "db")
        create_dataset(path, [syn[i] for i in range(6)])
        ds_test = MixLMDBDataset(path, voc_type="lower", test=True,
                                 batch_hw=(16, 64), scale=2)
        hr, lr, label = ds_test[0]
        assert hr.size == (64, 16) and lr.size == (32, 8)
        ds_train = MixLMDBDataset(path, voc_type="lower", test=False,
                                  batch_hw=(16, 64), scale=2, seed=1)
        sizes = {ds_train[i][1].size for i in range(6)}
        assert len(sizes) >= 1  # mixes stored LR and HR-as-LR
