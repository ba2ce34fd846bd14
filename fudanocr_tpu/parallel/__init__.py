"""Parallelism utilities (re-exported from core.mesh for discoverability).

Design (SURVEY.md §2.8): one `jax.sharding.Mesh` over ('data', 'model');
batch tensors shard over 'data' (the reference's DataParallel/DDP), the
'model' axis stays available for tensor parallelism (unused by the
reference's model scale but exercised by __graft_entry__.dryrun_multichip);
XLA emits ICI collectives for gradient all-reduce and global batch-norm
statistics; multi-host runs initialize via `setup_distributed` and stripe
data with `host_shard_indices`.
"""

from fudanocr_tpu.core.mesh import (
    make_mesh,
    make_mesh_for_batch,
    data_sharding,
    replicated,
    shard_batch,
    replicate_tree,
    local_batch_size,
    setup_distributed,
    host_shard_indices,
)
from fudanocr_tpu.parallel.tp import last_dim_spec, shard_params_tp
