"""Batched inference server: correctness, bucketing, padding, errors."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from fudanocr_tpu.serving import InferenceServer


def _double(x):
    return x * 2.0


def test_results_match_direct_application():
    srv = InferenceServer(_double, buckets=(1, 4), max_wait_ms=2.0)
    rng = np.random.default_rng(0)
    imgs = [rng.random((4, 6, 3), np.float32) for _ in range(11)]
    futs = [srv.submit(im) for im in imgs]
    for im, fut in zip(imgs, futs):
        np.testing.assert_allclose(fut.result(timeout=30), im * 2.0,
                                   rtol=1e-6)
    srv.close()
    # every executed batch used a declared bucket size
    assert set(srv.batch_sizes) <= {1, 4}


def test_concurrent_submitters_and_full_batches():
    srv = InferenceServer(_double, buckets=(1, 8), max_wait_ms=50.0)
    results = {}
    lock = threading.Lock()

    def client(i):
        im = np.full((2, 2, 1), float(i), np.float32)
        out = srv.submit(im).result(timeout=30)
        with lock:
            results[i] = out

    threads = [threading.Thread(target=client, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.close()
    for i in range(16):
        np.testing.assert_allclose(results[i], np.full((2, 2, 1), 2.0 * i))
    # concurrent load should have produced at least one full bucket-8 batch
    assert 8 in srv.batch_sizes


def test_trickle_request_latency_bounded():
    srv = InferenceServer(_double, buckets=(4, 8), max_wait_ms=5.0)
    t0 = time.perf_counter()
    out = srv.submit(np.ones((2, 2, 1), np.float32)).result(timeout=30)
    dt = time.perf_counter() - t0
    srv.close()
    np.testing.assert_allclose(out, 2.0 * np.ones((2, 2, 1)))
    assert dt < 10.0  # one padded min-bucket flush, not a hang


def test_deadline_flush_pads_whole_backlog_into_one_bucket():
    """7 pending with buckets (1, 8) must leave as ONE padded batch-8 at
    the deadline — not trickle out one bucket-1 flush per max_wait."""
    srv = InferenceServer(_double, buckets=(1, 8), max_wait_ms=100.0)
    imgs = [np.full((2, 2, 1), float(i), np.float32) for i in range(7)]
    t0 = time.perf_counter()
    futs = [srv.submit(im) for im in imgs]
    outs = [f.result(timeout=30) for f in futs]
    dt = time.perf_counter() - t0
    srv.close()
    for i, out in enumerate(outs):
        np.testing.assert_allclose(out, 2.0 * imgs[i])
    assert list(srv.batch_sizes) == [8]
    assert dt < 60.0  # one deadline, not seven


def test_mixed_shapes_served_in_same_shape_runs():
    """A shape change must end the batch, not crash the batcher or poison
    other requests."""
    srv = InferenceServer(_double, buckets=(1, 4), max_wait_ms=5.0)
    a = np.ones((2, 2, 1), np.float32)
    b = np.ones((3, 5, 1), np.float32) * 3.0
    fa = srv.submit(a)
    fb = srv.submit(b)
    fc = srv.submit(a * 5.0)
    np.testing.assert_allclose(fa.result(timeout=30), 2.0 * a)
    np.testing.assert_allclose(fb.result(timeout=30), 2.0 * b)
    np.testing.assert_allclose(fc.result(timeout=30), 10.0 * a)
    srv.close()


def test_apply_errors_propagate_and_close_rejects():
    def broken(x):
        return jnp.reshape(x, (-1, 9999))  # invalid at runtime

    srv = InferenceServer(broken, buckets=(1,), max_wait_ms=1.0)
    fut = srv.submit(np.ones((2, 2, 1), np.float32))
    with pytest.raises(Exception):
        fut.result(timeout=30)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(np.ones((2, 2, 1), np.float32))


def test_warmup_and_stats():
    srv = InferenceServer(_double, buckets=(1, 4), max_wait_ms=2.0)
    srv.warmup(np.ones((2, 2, 1), np.float32))  # compiles both buckets
    assert srv.stats()["requests"] == 0
    futs = [srv.submit(np.full((2, 2, 1), i, np.float32)) for i in range(5)]
    for i, f in enumerate(futs):
        np.testing.assert_allclose(f.result(timeout=30), 2.0 * i)
    srv.close()
    s = srv.stats()
    assert s["requests"] == 5
    assert 0.0 <= s["p50_ms"] <= s["p99_ms"] <= s["max_ms"]
    assert sum(s["batches"]) >= 5


def test_pixels_to_strings_matches_separate_calls():
    """The one-jit composed path (SR -> resize -> CRNN -> CTC) must decode
    exactly the same strings as running each stage as its own call
    (reference flow: super_resolution.py:241-329 + get_crnn_pred :143)."""
    import jax
    from fudanocr_tpu.eval.ctc import CTCLabelConverter, ctc_greedy_decode
    from fudanocr_tpu.models.rec.crnn import CRNN, parse_crnn_input
    from fudanocr_tpu.models.sr import TBSRN
    from fudanocr_tpu.serving import PixelsToStrings

    sr_model = TBSRN(scale_factor=2, width=32, height=16, stn=False,
                     srb_nums=1, hidden_units=4)
    crnn = CRNN(num_classes=37, hidden=32)
    lr = jax.random.uniform(jax.random.PRNGKey(0), (3, 8, 16, 3))
    sr_vars = sr_model.init(jax.random.PRNGKey(1), lr)
    # reference evaluator config: 1-channel gray input (base.py:310)
    crnn_vars = crnn.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 100, 1)))

    conv = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")
    pipe = PixelsToStrings(lambda x: sr_model.apply(sr_vars, x),
                           lambda x: crnn.apply(crnn_vars, x), conv)
    got, sr_out = pipe(lr, return_sr=True)

    # separate calls, stage by stage (gray transform = parse_crnn_data)
    sr = sr_model.apply(sr_vars, lr)
    ids = ctc_greedy_decode(crnn.apply(crnn_vars, parse_crnn_input(sr)))
    want = conv.decode_ids(np.asarray(ids))

    assert got == want
    np.testing.assert_allclose(np.asarray(sr_out), np.asarray(sr), atol=1e-6)
    # ids_fn serves through the batching server too
    srv = InferenceServer(pipe.ids_fn, buckets=(1, 4), max_wait_ms=2.0)
    futs = [srv.submit(np.asarray(lr[i])) for i in range(3)]
    served = [pipe.decode_ids(f.result(timeout=60)[None])[0] for f in futs]
    srv.close()
    assert served == want


def test_lmdb_to_strings_pipeline_matches_pixels_to_strings():
    """LMDBToStrings (LMDB -> uint8 LR -> device normalize -> one-jit
    SR+CRNN+CTC -> string join) must yield exactly the strings
    PixelsToStrings produces on the float-collated LR batches — the
    uint8 wire format and LR-only decode change nothing downstream."""
    import tempfile

    import jax
    from fudanocr_tpu.data.lmdb_dataset import (PairedLMDBDataset,
                                                create_dataset)
    from fudanocr_tpu.data.synthetic import SyntheticTextZoom
    from fudanocr_tpu.eval.ctc import CTCLabelConverter
    from fudanocr_tpu.models.rec.crnn import CRNN
    from fudanocr_tpu.models.sr import TBSRN
    from fudanocr_tpu.serving import LMDBToStrings, PixelsToStrings

    sr_model = TBSRN(scale_factor=2, width=64, height=16, stn=False,
                     srb_nums=1, hidden_units=4)
    crnn = CRNN(num_classes=37, hidden=32)
    lr0 = jnp.zeros((1, 8, 32, 3))
    sr_vars = sr_model.init(jax.random.PRNGKey(1), lr0)
    crnn_vars = crnn.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 100, 1)))
    conv = CTCLabelConverter("0123456789abcdefghijklmnopqrstuvwxyz")
    pipe = PixelsToStrings(lambda x: sr_model.apply(sr_vars, x),
                           lambda x: crnn.apply(crnn_vars, x), conv)

    with tempfile.TemporaryDirectory() as tmp:
        path = tmp + "/db"
        syn = SyntheticTextZoom(num_samples=6, hr_size=(64, 16))
        create_dataset(path, [syn[i] for i in range(6)])

        got = []
        for texts in LMDBToStrings(pipe, path, batch_size=3,
                                   batch_hw=(16, 64), scale=2):
            got += texts
        assert len(got) == 6

        ds = PairedLMDBDataset(path, voc_type="lower", batch_hw=(16, 64),
                               scale=2)
        want = []
        for _, lr, _labels in ds.batches(3):
            want += pipe(jnp.asarray(lr))
        assert got == want
