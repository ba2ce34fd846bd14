"""OI-CTR and ACPM: app-level smoke + unit checks for their unique parts."""

import tempfile

import numpy as np
import pytest


def test_oictr_swap_indices():
    from fudanocr_tpu.apps.oictr.train import swap_indices

    is_v = np.asarray([0, 0, 1, 1, 0])
    valid = np.asarray([1, 1, 1, 1, 1])
    swap = swap_indices(is_v, valid)
    # horizontal chars get vertical partners and vice versa
    assert all(is_v[swap[i]] == 1 for i in (0, 1, 4))
    assert all(is_v[swap[i]] == 0 for i in (2, 3))
    # all same orientation -> identity
    swap2 = swap_indices(np.zeros(4, int), np.ones(4))
    np.testing.assert_array_equal(swap2, np.arange(4))


def test_profile_matching_prefers_exact_profile():
    from fudanocr_tpu.eval.profile_matching import (get_candidates,
                                                    select_candidate)

    legal = ["abc", "abd", "xyz"]
    cands = get_candidates("abe", legal, search_level=0)
    assert set(cands) == {0, 1}

    feat = np.zeros((4, 4), np.float32)
    pf = {0: feat + 0.5, 1: feat}  # candidate 1 matches the probe feature
    pick = select_candidate(
        cands, feat, 3.0, np.ones(4), np.ones(4),
        pf, [3.0, 3.0, 3.0], [np.ones(4)] * 3, [np.ones(4)] * 3)
    assert pick == 1


def test_oictr_app_smoke():
    from fudanocr_tpu.apps.oictr.train import main

    with tempfile.TemporaryDirectory() as tmp:
        main(["--options", "epoch=1", "batch=4", "synthetic_samples=8",
              "max_len=4", "imageH=32", "imageW=32", f"ckpt_dir={tmp}",
              "val_frequency=1000000", "encoder_layers=1,1,1",
              "d_model=64", "d_embed=32", "encoder_width_div=8"])


def test_acpm_app_smoke():
    from fudanocr_tpu.apps.acpm.train import main

    with tempfile.TemporaryDirectory() as tmp:
        main(["--options", "epoch=1", "batch=4", "synthetic_samples=8",
              "max_len=6", f"ckpt_dir={tmp}", "val_frequency=1000000",
              "encoder_layers=1,1,1,1", "d_model=128",
              "encoder_width_div=8"])
