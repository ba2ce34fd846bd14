"""Device mesh and sharding helpers.

Replaces the reference's three distribution mechanisms — nn.DataParallel
scatter/gather (scene-text-telescope/interfaces/base.py:179),
MMDistributedDataParallel over NCCL (text-focused-Transformers/
mmseg/apis/train.py:104-113), and DistributedSampler — with one
`jax.sharding.Mesh` over axes ('data', 'model').

Batch tensors are sharded over 'data'; parameters are replicated (the
reference never tensor-parallelises, its largest model is ResNet-50 scale),
but the 'model' axis is kept in the mesh so tensor parallelism can be turned
on per-layer without touching call sites. XLA emits the gradient all-reduce
over ICI that the reference got from NCCL.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence[jax.Device]] = None
                        ) -> Mesh:
    """Mesh whose 'data' axis divides `batch_size` (unused devices are left
    out rather than forcing padded batches)."""
    import math

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    data = math.gcd(n, batch_size)
    if data < n:
        import logging
        logging.getLogger("fudanocr_tpu.mesh").warning(
            "batch %d does not divide across %d devices: using %d, "
            "leaving %d idle — pad the batch to a multiple of %d to use "
            "all devices", batch_size, n, data, n - data, n)
    return make_mesh(devices[:data], data=data, model=1)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays, batch-sharded over 'data'."""

    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(_put, batch)


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-host batch when running multi-process (jax.distributed)."""
    return global_batch // jax.process_count()


def setup_distributed(coordinator_address: Optional[str] = None,
                      num_processes: Optional[int] = None,
                      process_id: Optional[int] = None) -> int:
    """Multi-host initialisation (replaces init_dist/NCCL process groups,
    text-focused-Transformers/tools/train.py:150-159). On a single host
    this is a no-op. Returns the process index."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def host_shard_indices(n: int, batch_size: int) -> range:
    """Per-host index striping over a dataset of size n — the
    DistributedSampler equivalent (mmseg/datasets/samplers/
    distributed_sampler.py:13-48): process k reads every
    process_count-th batch."""
    pc, pi = jax.process_count(), jax.process_index()
    return range(pi * batch_size, n, pc * batch_size)
