"""Tensor-parallel placement helpers over the ('data','model') mesh
(8 virtual CPU devices via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from fudanocr_tpu.parallel import (last_dim_spec, make_mesh, replicate_tree,
                                   shard_params_tp)


def test_last_dim_spec_rules():
    w = jnp.zeros((64, 128))
    b = jnp.zeros((128,))
    odd = jnp.zeros((4, 7))
    assert last_dim_spec(w, 2) == P(None, "model")
    assert last_dim_spec(b, 2) == P()          # 1-D: replicated
    assert last_dim_spec(odd, 2) == P()        # indivisible last dim
    assert last_dim_spec(w, 1) == P()          # no model parallelism


def test_shard_params_tp_placement_and_numerics():
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tree = {"dense": {"kernel": jnp.arange(32.0).reshape(4, 8),
                      "bias": jnp.arange(8.0)}}
    placed = shard_params_tp(tree, mesh)

    kspec = placed["dense"]["kernel"].sharding.spec
    assert tuple(kspec) == (None, "model")
    bspec = placed["dense"]["bias"].sharding.spec
    assert tuple(bspec) == ()

    # numerics survive placement, and a jit over the mesh consumes the
    # sharded kernel (GSPMD inserts the collectives)
    np.testing.assert_array_equal(np.asarray(placed["dense"]["kernel"]),
                                  np.asarray(tree["dense"]["kernel"]))
    x = jnp.ones((8, 4))
    y = jax.jit(lambda p, x: x @ p["dense"]["kernel"] + p["dense"]["bias"])(
        placed, x)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(x @ tree["dense"]["kernel"] + tree["dense"]["bias"]))


def test_shard_params_tp_degrades_to_replication():
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    tree = {"w": jnp.ones((4, 8))}
    placed = shard_params_tp(tree, mesh)
    assert tuple(placed["w"].sharding.spec) == ()
    replicate_tree(mesh, tree)  # smoke: facade export works
