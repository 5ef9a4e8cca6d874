"""Device-mesh and sharding utilities."""

from .mesh import create_mesh, data_sharding, replicated_sharding
from .tp import shard_params_tp, tp_param_shardings, tp_param_specs
from .pp import current_pipeline_parallel, pipeline_blocks, pipeline_parallel
from .sp_scan import (
    current_sequence_parallel,
    selective_scan_sequence_parallel,
    sequence_parallel,
)

__all__ = [
    "create_mesh",
    "shard_params_tp",
    "tp_param_shardings",
    "tp_param_specs",
    "data_sharding",
    "replicated_sharding",
    "sequence_parallel",
    "current_sequence_parallel",
    "selective_scan_sequence_parallel",
    "pipeline_parallel",
    "current_pipeline_parallel",
    "pipeline_blocks",
]
