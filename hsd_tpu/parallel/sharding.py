"""Partition specs for model weights and KV caches (GSPMD tensor parallelism).

The reference shards nothing at tensor granularity — it places whole layers on
GPUs (`manual_device_map`, eval_speculative_decoding_llm.py:204-260). Here the
target model is Megatron-style TP-sharded over the `model` mesh axis:

  * attention qkv out-features and o_proj in-features -> head shards;
  * MLP gate/up out-features and down in-features -> ffn shards;
  * lm_head out-features -> vocab shards (verification needs full-vocab rows,
    so the engine all-gathers the gamma+1 logit rows — tiny vs the matmul);
  * KV cache sharded on the kv-head axis: append and rollback stay local on
    every chip (the "sharded in-place KV rollback" north star);
  * norms / biases replicated; embedding vocab-sharded.

Quantized weights shard their codes AND per-group scales/zeros with the same
out/in-feature rule (group axis follows in-features).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import ModelParams
from ..ops.linear import QuantizedLinear
from .mesh import DATA_AXIS, MODEL_AXIS


def _linear_spec(w: Any, in_spec, out_spec, stacked: bool, lead=()):
    """PartitionSpec tree for a dense array or QuantizedLinear.

    stacked=True prepends the layer axis (replicated); `lead` appends
    further leading axes (e.g. the MoE expert axis) after it."""
    lead = ((None,) if stacked else ()) + tuple(lead)
    if isinstance(w, QuantizedLinear):
        return QuantizedLinear(
            qweight=P(*lead, in_spec, out_spec),
            scales=P(*lead, in_spec, out_spec),
            zeros=None if w.zeros is None else P(*lead, in_spec, out_spec),
            # desc_act permutation: replicated (the activation gather happens
            # pre-matmul in full width; GSPMD inserts the collective if the
            # in-axis is sharded)
            perm=None if w.perm is None else P(*lead, None),
        )
    return P(*lead, in_spec, out_spec)


def _is_expert_stacked(w: Any) -> bool:
    """True for MoE expert weights: [L, E, in, out] (dense) or a
    QuantizedLinear whose qweight carries the extra expert axis."""
    arr = w.qweight if isinstance(w, QuantizedLinear) else w
    return arr.ndim == 4


def param_specs(params: ModelParams,
                expert_parallel: bool = False) -> ModelParams:
    """ModelParams-shaped tree of PartitionSpecs (Megatron TP layout).

    MoE expert stacks ([L, E, in, out]) have two layouts:
      * expert_parallel=False (default): TP inside each expert — ffn axis
        sharded like the dense MLP; every device holds a slice of every
        expert (uniform memory/compute regardless of routing skew).
      * expert_parallel=True: the EXPERT axis rides `model` — each device
        streams only its local experts and the all-expert einsum in
        models/transformer._moe_ffn reduces with one psum (no all-to-all).
        Requires num_experts % mesh.model == 0.
    The router gate is always replicated.
    """
    L = params.layers
    specs = {}
    for name, w in L.items():
        if name in ("ln1", "ln2"):
            specs[name] = P(None, None)
        elif name == "gate":
            specs[name] = P(None, None, None)
        elif name in ("wgate", "wup") and _is_expert_stacked(w):
            specs[name] = (_linear_spec(w, None, None, True, (MODEL_AXIS,))
                           if expert_parallel else
                           _linear_spec(w, None, MODEL_AXIS, True, (None,)))
        elif name == "wdown" and _is_expert_stacked(w):
            specs[name] = (_linear_spec(w, None, None, True, (MODEL_AXIS,))
                           if expert_parallel else
                           _linear_spec(w, MODEL_AXIS, None, True, (None,)))
        elif name in ("wq", "wk", "wv", "wgate", "wup"):
            specs[name] = _linear_spec(w, None, MODEL_AXIS, stacked=True)
        elif name in ("wo", "wdown"):
            specs[name] = _linear_spec(w, MODEL_AXIS, None, stacked=True)
        elif name in ("bq", "bk", "bv"):
            specs[name] = P(None, MODEL_AXIS)
        else:
            specs[name] = P(None, None)
    lm = None
    if params.lm_head is not None:
        lm = _linear_spec(params.lm_head, None, MODEL_AXIS, stacked=False)
    return ModelParams(
        embed=P(MODEL_AXIS, None),   # vocab-sharded; tied head gathers
        layers=specs,
        final_norm=P(None),
        lm_head=lm,
    )


def cache_specs() -> Any:
    """KVCache PartitionSpecs: [L, B, S, H_kv, D] with heads on `model`."""
    from ..engine.kvcache import KVCache
    return KVCache(k=P(None, None, None, MODEL_AXIS, None),
                   v=P(None, None, None, MODEL_AXIS, None),
                   length=P(), start=P(None))


def shard_tree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """device_put a pytree with NamedShardings built from a spec tree."""
    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s))
    return jax.tree.map(put, tree, specs,
                        is_leaf=lambda x: x is None)


def shard_params(params: ModelParams, mesh: Mesh,
                 expert_parallel: bool = False) -> ModelParams:
    return shard_tree(params, param_specs(params, expert_parallel), mesh)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
