"""Tensor-parallel parameter placement over the mesh's 'model' axis.

The reference never tensor-parallelises (its largest model is ResNet-50
scale, SURVEY.md §2.8), so the framework's meshes keep a 'model' axis open
instead: these helpers place parameters so XLA's GSPMD partitioner emits
the ICI all-gathers/reduce-scatters, without touching any call site.
`__graft_entry__.dryrun_multichip` runs a full TBSRN+oracle train step
under this placement on a (data, model) mesh; tests/test_parallel.py
checks placement and numerics on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def last_dim_spec(x: Any, model_par: int) -> P:
    """PartitionSpec sharding the LAST axis over 'model' when it divides
    evenly — the natural tensor-parallel layout for Dense/Conv kernels
    (out-features last in flax); everything else is replicated."""
    if (hasattr(x, "ndim") and x.ndim >= 2 and model_par > 1
            and x.shape[-1] % model_par == 0):
        return P(*([None] * (x.ndim - 1) + ["model"]))
    return P()


def shard_params_tp(tree: Any, mesh: Mesh) -> Any:
    """device_put a parameter pytree with last-dim-over-'model' placement.

    With model axis size 1 this degrades to plain replication, so callers
    can apply it unconditionally.
    """
    model_par = mesh.shape.get("model", 1)

    def place(x):
        return jax.device_put(
            x, NamedSharding(mesh, last_dim_spec(x, model_par)))

    return jax.tree_util.tree_map(place, tree)
