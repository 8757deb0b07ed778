"""Mesh + sharding: GSPMD tensor/data parallelism over ICI."""
from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, single_device_mesh
from .sharding import (cache_specs, param_specs, replicate, shard_params,
                       shard_tree)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "single_device_mesh",
           "cache_specs", "param_specs", "replicate", "shard_params",
           "shard_tree"]
