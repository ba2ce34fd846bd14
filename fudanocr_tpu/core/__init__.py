from fudanocr_tpu.core.config import Config, load_config, merge_cli_overrides
from fudanocr_tpu.core.registry import Registry
from fudanocr_tpu.core.mesh import make_mesh, data_sharding, replicated
