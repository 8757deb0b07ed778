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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host bring-up (replaces DeepSpeed/NCCL init at
    traineagle3/main.py:213-221 and Ray init at
    gen_ea_answer_llama3chat.py:233-263): one SPMD program per host.

    No-ops on single-process runs (already-initialized or no coordinator
    configured). Returns jax.process_index(). On TPU pods with default
    orchestration, bare jax.distributed.initialize() self-discovers.
    """
    try:
        if num_processes is not None or coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        elif jax.process_count() == 1 and len(jax.devices()) > len(
                jax.local_devices()):
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized / single host
    return jax.process_index()


def make_global_mesh(model: int = 1) -> Mesh:
    """Mesh over ALL processes' devices: `model` innermost (ICI within a
    host/slice), remaining device count on `data` (DCN across hosts) — the
    axis layout that keeps tensor-parallel collectives off the slow links."""
    n = len(jax.devices())
    assert n % model == 0, (n, model)
    return make_mesh(data=n // model, model=model)


def shard_for_process(items: Sequence, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> list:
    """Data-parallel eval fan-out: contiguous per-host slice of the question
    set (replaces the reference's Ray chunking, SURVEY.md §2.5)."""
    i = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    per = (len(items) + n - 1) // n
    return list(items[i * per:(i + 1) * per])
