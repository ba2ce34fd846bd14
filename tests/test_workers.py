"""Multi-process host loading (data/workers.py) + batched native reads."""

import functools
import os
import tempfile

import numpy as np
import pytest

from fudanocr_tpu.data.lmdb_dataset import PairedLMDBDataset, create_dataset
from fudanocr_tpu.data.lmdb_store import LMDBReader, LMDBWriter
from fudanocr_tpu.data.workers import WorkerBatches


def _make_db(tmp, n=12):
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom

    syn = SyntheticTextZoom(num_samples=n, hr_size=(64, 16))
    path = os.path.join(tmp, "textzoom")
    create_dataset(path, [syn[i] for i in range(n)])
    return path


def test_get_many_matches_get():
    rng = np.random.default_rng(7)
    data = {b"k%05d" % i: bytes(rng.integers(0, 256, 40, dtype=np.uint8))
            for i in range(200)}
    with tempfile.TemporaryDirectory() as tmp:
        w = LMDBWriter(os.path.join(tmp, "db"))
        w.update(data)
        w.write()
        for use_native in (True, False):
            r = LMDBReader(os.path.join(tmp, "db"), use_native=use_native)
            keys = [b"k%05d" % i for i in (0, 7, 199)] + [b"missing"]
            got = r.get_many(keys)
            assert got == [r.get(k) for k in keys]
            assert got[-1] is None
            assert r.get_many([]) == []
            r.close()


def test_fetch_items_matches_getitem():
    with tempfile.TemporaryDirectory() as tmp:
        path = _make_db(tmp)
        ds = PairedLMDBDataset(path, voc_type="lower",
                               batch_hw=(16, 64), scale=2)
        idx = [3, 0, 11, 5]
        batched = ds.fetch_items(idx)
        for got, i in zip(batched, idx):
            hr, lr, label = ds[i]
            assert got[2] == label
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(hr))
            np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(lr))


@pytest.mark.parametrize("workers", [0, 2])
def test_worker_batches_order_and_content(workers):
    with tempfile.TemporaryDirectory() as tmp:
        path = _make_db(tmp)
        factory = functools.partial(PairedLMDBDataset, path,
                                    voc_type="lower", batch_hw=(16, 64),
                                    scale=2)
        ds = factory()
        want = list(ds.batches(4))
        got = list(WorkerBatches(factory, batch_size=4,
                                 num_workers=workers))
        assert len(got) == len(want) == 3
        for (ghr, glr, glab), (whr, wlr, wlab) in zip(got, want):
            np.testing.assert_array_equal(ghr, whr)
            np.testing.assert_array_equal(glr, wlr)
            assert glab == wlab


def test_worker_batches_epochs_and_partial_tail():
    with tempfile.TemporaryDirectory() as tmp:
        path = _make_db(tmp, n=10)
        factory = functools.partial(PairedLMDBDataset, path,
                                    voc_type="lower", batch_hw=(16, 64),
                                    scale=2)
        # batch 4 over 10 samples: 2 full batches/epoch with drop_last
        got = list(WorkerBatches(factory, batch_size=4, epochs=2))
        assert len(got) == 4
        keep = list(WorkerBatches(factory, batch_size=4, drop_last=False))
        assert len(keep) == 3 and keep[-1][0].shape[0] == 2


def test_uint8_collate_plus_device_normalize_matches_float_collate():
    """The fed pipeline ships uint8 and normalizes on device
    (data/collate.py::normalize_uint8); that two-step path must equal the
    float32 host collate bit-exactly (same /255 on the same bytes),
    including the 0/255-encoded mask channel."""
    import jax.numpy as jnp

    from fudanocr_tpu.data.collate import normalize_uint8

    with tempfile.TemporaryDirectory() as tmp:
        path = _make_db(tmp, n=4)
        ds = PairedLMDBDataset(path, voc_type="lower", batch_hw=(16, 64),
                               scale=2)
        for mask in (False, True):
            items = ds.fetch_items(range(4))
            hr_f, lr_f, lab_f = ds.collate(items, mask=mask)
            hr_u, lr_u, lab_u = ds.collate(items, mask=mask,
                                           dtype=np.uint8)
            assert hr_u.dtype == np.uint8 and lr_u.dtype == np.uint8
            assert lab_u == lab_f
            np.testing.assert_array_equal(
                np.asarray(normalize_uint8(jnp.asarray(hr_u))), hr_f)
            np.testing.assert_array_equal(
                np.asarray(normalize_uint8(jnp.asarray(lr_u))), lr_f)


def test_lr_serving_dataset_matches_paired_lr():
    """LRServingLMDBDataset must produce exactly the LR half of the
    paired collate (same bytes, same labels) while never decoding HR."""
    from fudanocr_tpu.data.lmdb_dataset import LRServingLMDBDataset

    with tempfile.TemporaryDirectory() as tmp:
        path = _make_db(tmp, n=6)
        pair = PairedLMDBDataset(path, voc_type="lower", batch_hw=(16, 64),
                                 scale=2)
        lrds = LRServingLMDBDataset(path, voc_type="lower", batch_hw=(16, 64),
                                    scale=2)
        assert len(lrds) == len(pair)
        _, lr_f, lab_f = pair.collate(pair.fetch_items(range(6)))
        lr_u, lab_u = lrds.collate(lrds.fetch_items(range(6)))
        assert lr_u.dtype == np.uint8 and lab_u == lab_f
        np.testing.assert_array_equal(lr_u.astype(np.float32) / 255.0, lr_f)
