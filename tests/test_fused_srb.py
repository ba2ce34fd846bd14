"""Parity of the whole-SRB kernel (ops/fused_srb) against the unfused
TransformerResidualBlock chain, in interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np

from fudanocr_tpu.models.sr.tbsrn import TransformerResidualBlock

B, H, W, C = 2, 8, 64, 64


def _feats(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
    return (x * 0.5).astype(dtype)


def _init_with_stats(mod, x):
    """Init then run one train step so batch_stats move off their init
    values (the kernel folds REAL running stats into the conv weights)."""
    v = mod.init(jax.random.PRNGKey(1), x)
    _, updated = mod.apply(v, x, True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(2)})
    return {"params": v["params"], "batch_stats": updated["batch_stats"]}


def test_fused_srb_module_parity_fp32():
    ref = TransformerResidualBlock(C)
    fused = TransformerResidualBlock(C, fuse_srb="force")
    x = _feats(jnp.float32)

    v_ref = _init_with_stats(ref, x)
    v_fused = fused.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fused))

    want = np.asarray(ref.apply(v_ref, x))
    got = np.asarray(fused.apply(v_ref, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_srb_parity_bf16():
    ref = TransformerResidualBlock(C, dtype=jnp.bfloat16)
    fused = TransformerResidualBlock(C, dtype=jnp.bfloat16, fuse_srb="force")
    x = _feats(jnp.bfloat16)
    v = _init_with_stats(ref, x)
    want = np.asarray(ref.apply(v, x), np.float32)
    got = np.asarray(fused.apply(v, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    assert float(np.mean(np.abs(got - want))) < 0.01


def test_fused_srb_train_falls_back():
    """train=True must take the module path (BN stats update, dropout)."""
    ref = TransformerResidualBlock(C)
    fused = TransformerResidualBlock(C, fuse_srb="force")
    x = _feats(jnp.float32)
    v = ref.init(jax.random.PRNGKey(1), x)
    rng = {"dropout": jax.random.PRNGKey(3)}
    a, sa = ref.apply(v, x, True, mutable=["batch_stats"], rngs=rng)
    b, sb = fused.apply(v, x, True, mutable=["batch_stats"], rngs=rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for pa, pb in zip(jax.tree_util.tree_leaves(sa),
                      jax.tree_util.tree_leaves(sb)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_fold_bn_matches_separate_bn():
    from fudanocr_tpu.ops.fused_srb import fold_bn

    key = jax.random.PRNGKey(4)
    kernel = jax.random.normal(key, (3, 3, C, C)) * 0.1
    bias = jax.random.normal(jax.random.fold_in(key, 1), (C,)) * 0.1
    bn_p = {"scale": jnp.abs(jax.random.normal(
        jax.random.fold_in(key, 2), (C,))) + 0.5,
        "bias": jax.random.normal(jax.random.fold_in(key, 3), (C,))}
    bn_s = {"mean": jax.random.normal(jax.random.fold_in(key, 4), (C,)),
            "var": jnp.abs(jax.random.normal(
                jax.random.fold_in(key, 5), (C,))) + 0.1}
    x = jax.random.normal(jax.random.fold_in(key, 6), (B, H, W, C))

    y_sep = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    y_sep = ((y_sep - bn_s["mean"]) * jax.lax.rsqrt(bn_s["var"] + 1e-5)
             * bn_p["scale"] + bn_p["bias"])

    wf, bf = fold_bn(kernel, bias, bn_p, bn_s)
    y_fold = jax.lax.conv_general_dilated(
        x, wf, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_sep),
                               rtol=1e-3, atol=1e-4)
