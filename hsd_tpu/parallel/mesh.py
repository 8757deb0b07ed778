"""Device mesh construction.

Replaces the reference's distribution stack — accelerate.dispatch_model
layer-placement, DeepSpeed/NCCL, Ray fan-out (SURVEY.md §2.5) — with a single
jax.sharding.Mesh over ("data", "model"): data-parallel requests/batches on
`data`, tensor-parallel weight/KV shards on `model` riding ICI. Multi-host
runs call jax.distributed.initialize() before building the mesh; the same
SPMD program runs everywhere (no synced_gpus-style babysitting).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    need = data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
