"""Shape/behaviour smoke tests for the SR generators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fudanocr_tpu.models.sr import TBSRN, TSRN


@pytest.mark.parametrize("cls", [TBSRN, TSRN])
def test_sr_model_shapes(cls):
    model = cls(scale_factor=2, width=64, height=16, stn=False, srb_nums=2,
                hidden_units=8)
    x = jnp.zeros((2, 8, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 16, 64, 3)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh output


def test_tbsrn_train_mode_with_stn_runs():
    # STN needs the reference LR geometry (16x64) for its 5 pooling stages
    model = TBSRN(scale_factor=2, width=128, height=32, stn=True, srb_nums=1,
                  hidden_units=8)
    x = jnp.ones((2, 16, 64, 3)) * 0.1
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    y, mutated = model.apply(
        variables, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 32, 128, 3)
    assert "batch_stats" in mutated


def test_tbsrn_jit_and_grad():
    model = TSRN(scale_factor=2, width=64, height=16, stn=False, srb_nums=1,
                 hidden_units=8)
    x = jnp.ones((2, 8, 32, 3)) * 0.5
    hr = jnp.zeros((2, 16, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(params):
        y = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]}, x)
        return jnp.mean((y - hr) ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)
