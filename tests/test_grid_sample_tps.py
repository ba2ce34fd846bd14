"""grid_sample vs torch oracle; TPS identity-warp property test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fudanocr_tpu.ops.grid_sample import grid_sample_bilinear
from fudanocr_tpu.nn.tps import TPSSpatialTransformer, build_output_control_points


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    grid = (rng.random((2, 5, 7, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))

    with torch.no_grad():
        want = torch.nn.functional.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tps_matches_reference_module():
    """Parity against the reference's own TPSSpatialTransformer (used as a
    numerics oracle only; skipped when /root/reference is absent)."""
    torch = pytest.importorskip("torch")
    import sys
    ref_dir = "/root/reference/scene-text-telescope"
    import os
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, ref_dir)
    try:
        from model.tps_spatial_transformer import (
            TPSSpatialTransformer as RefTPS)
    finally:
        sys.path.pop(0)

    h, w, n = 16, 64, 20
    rng = np.random.default_rng(4)
    img = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    # random perturbation of the canonical control grid
    ctrl = (build_output_control_points(n, (0.05, 0.05))[None].repeat(2, 0)
            + rng.normal(0, 0.03, (2, n, 2)).astype(np.float32))

    tps = TPSSpatialTransformer(output_size=(h, w), num_control_points=n,
                                margins=(0.05, 0.05))
    params = tps.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(ctrl))
    got, got_src = tps.apply(params, jnp.asarray(img), jnp.asarray(ctrl))

    ref = RefTPS(output_image_size=(h, w), num_control_points=n,
                 margins=(0.05, 0.05))
    with torch.no_grad():
        want, want_src = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                             torch.from_numpy(ctrl))
    want = want.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(got_src), want_src.numpy(),
                               rtol=1e-3, atol=1e-4)
    # image values: fp32 accumulation-order noise through the bilinear
    # weights allows a few-milli absolute slack
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-2, atol=5e-3)
