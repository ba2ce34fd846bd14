"""Prefetch pipeline + LR schedules."""

import numpy as np
import jax.numpy as jnp


def test_prefetch_yields_all_batches_in_order():
    from fudanocr_tpu.data.prefetch import prefetch

    batches = iter([{"x": np.full((2, 2), i)} for i in range(5)])
    out = list(prefetch(batches, buffer_size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i


def test_prefetch_propagates_errors():
    from fudanocr_tpu.data.prefetch import prefetch

    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch(gen())
    next(it)
    try:
        next(it)
        assert False, "expected error"
    except RuntimeError as e:
        assert "boom" in str(e)


def test_cosine_warm_restarts_shape():
    from fudanocr_tpu.train.schedules import cosine_warm_restarts

    s = cosine_warm_restarts(1.0, t0=10)
    assert abs(float(s(0)) - 1.0) < 1e-6
    assert float(s(5)) < 1.0
    # restart: back to base at t0
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert float(s(9)) < 0.1


def test_step_decay_after():
    from fudanocr_tpu.train.schedules import step_decay_after

    s = step_decay_after(1.0, start_epoch=10, every=2, steps_per_epoch=1)
    assert float(s(5)) == 1.0
    assert abs(float(s(12)) - 0.8) < 1e-6
    assert abs(float(s(14)) - 0.64) < 1e-6
