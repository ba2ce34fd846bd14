"""Parity of the whole-block fused enhancer kernel (ops/fused_enhancer)
against the unfused FeatureEnhancer sublayer chain, in interpret mode on
the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.models.sr.tbsrn import FeatureEnhancer

B, H, W = 2, 8, 64            # L = 512 (the kernel's minimum)
C = 64


def _tokens(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H * W, C), jnp.float32)
    return (x * 0.5).astype(dtype)


def test_fused_enhancer_module_parity_fp32():
    """fuse='force' must produce the same params AND the same outputs as
    the unfused path (same formulas, fp32 end to end)."""
    ref = FeatureEnhancer(height=H, width=W)
    fused = FeatureEnhancer(height=H, width=W, fuse="force")
    x = _tokens(jnp.float32)

    v_ref = ref.init(jax.random.PRNGKey(1), x)
    v_fused = fused.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fused))
    for a, b in zip(jax.tree_util.tree_leaves(v_ref),
                    jax.tree_util.tree_leaves(v_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(ref.apply(v_ref, x))
    got = np.asarray(fused.apply(v_ref, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_enhancer_kernel_parity_bf16():
    """bf16 activations: the kernel rounds at the same sublayer boundaries
    as the module path, so agreement is bf16-tight."""
    ref = FeatureEnhancer(height=H, width=W, dtype=jnp.bfloat16)
    fused = FeatureEnhancer(height=H, width=W, dtype=jnp.bfloat16,
                            fuse="force")
    x = _tokens(jnp.bfloat16)
    v = ref.init(jax.random.PRNGKey(2), x)
    want = np.asarray(ref.apply(v, x), np.float32)
    got = np.asarray(fused.apply(v, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    assert float(np.mean(np.abs(got - want))) < 0.01


def test_fused_flag_off_is_noop_on_cpu():
    """fuse=True (non-forced) must fall back on the CPU backend — same
    outputs, no interpret-mode kernel."""
    ref = FeatureEnhancer(height=H, width=W)
    flagged = FeatureEnhancer(height=H, width=W, fuse=True)
    x = _tokens(jnp.float32)
    v = ref.init(jax.random.PRNGKey(3), x)
    np.testing.assert_array_equal(np.asarray(ref.apply(v, x)),
                                  np.asarray(flagged.apply(v, x)))


def test_fused_cost_estimate_matches_unfused_flops():
    """The kernel's declared CostEstimate must agree with the jaxpr-walk
    flop count of the unfused chain (the analytic-MFU accounting in
    bench_util relies on declared costs for Pallas calls) — minus the
    qkv FLOPs the PE hoisting genuinely removes: the batch-constant
    pe @ W_bot term is computed once outside the grid, so the fused
    total is LOWER by (B-1)/B of the PE half of the qkv matmul."""
    from bench_util import analytic_flops

    ref = FeatureEnhancer(height=H, width=W)
    fused = FeatureEnhancer(height=H, width=W, fuse="force")
    x = jnp.ones((B, H * W, C), jnp.float32)
    v = ref.init(jax.random.PRNGKey(4), x)
    a = analytic_flops(lambda v, x: ref.apply(v, x), v, x)["flops"]
    b = analytic_flops(lambda v, x: fused.apply(v, x), v, x)["flops"]
    l, d = H * W, C + 64
    pe_saving = (B - 1) * 2 * l * 64 * 3 * d  # hoisted pe-qkv term
    assert abs((b + pe_saving) - a) / a < 0.01, (a, b, pe_saving)
    assert b < a  # the fused path must actually do less work
