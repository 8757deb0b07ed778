"""Mesh + sharding: GSPMD tensor/data parallelism over ICI."""
from .mesh import (DATA_AXIS, MODEL_AXIS, initialize_multihost,
                   make_global_mesh, make_mesh, shard_for_process,
                   single_device_mesh)
from .sharding import (cache_specs, param_specs, replicate, shard_params,
                       shard_tree)
from .tp import (make_tp_eagle_forward, make_tp_forward,
                 make_tp_target_forward, shard_params_tp, tp_param_specs)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "initialize_multihost",
           "make_global_mesh", "make_mesh", "shard_for_process",
           "single_device_mesh", "cache_specs", "param_specs", "replicate",
           "shard_params", "shard_tree", "make_tp_forward",
           "shard_params_tp", "tp_param_specs", "make_tp_target_forward",
           "make_tp_eagle_forward"]
