"""PSNR/SSIM vs the reference implementations (torch oracles)."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from fudanocr_tpu.eval.metrics import psnr, ssim, str_filt, sequence_accuracy

REF = "/root/reference/scene-text-telescope"


def test_psnr_closed_form():
    a = np.zeros((2, 8, 8, 3), np.float32)
    b = np.full((2, 8, 8, 3), 0.1, np.float32)
    got = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    want = 20 * np.log10(255.0 / np.sqrt(np.mean((0.1 * 255) ** 2)))
    assert abs(got - want) < 1e-3


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_ssim_matches_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from utils.ssim_psnr import SSIM as RefSSIM
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(7)
    a = rng.random((2, 16, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        want = float(RefSSIM()(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                               torch.from_numpy(b.transpose(0, 3, 1, 2))))
    assert abs(got - want) < 2e-3, (got, want)


def test_str_filt_and_accuracy():
    assert str_filt("He!!o-12", "lower") == "heo12"
    assert str_filt("ABC", "upper") == "abc"
    assert sequence_accuracy(["abc", "xyz"], ["ABC!", "xy z"]) == 1.0
    assert sequence_accuracy(["abc", "nope"], ["abc", "xyz"]) == 0.5
