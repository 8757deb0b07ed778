"""Megatron-style tensor parallelism with LOCAL Pallas kernels (shard_map).

`parallel.shard_params` + plain jit (GSPMD) is the zero-effort TP path, but
GSPMD cannot partition a Pallas custom call, so quantized TP targets fall
back to the XLA matmul (7x off the kernel's weight-stream rate at 14B decode
shapes — docs/BENCHMARKS.md). This module provides the production path: the
whole decoder forward runs inside one `shard_map` over the `model` axis, so
every chip executes the SAME single-chip program — including the Pallas
dequant+matmul kernels — on its local Megatron shard, with exactly the
Megatron collectives (psum after o_proj / down_proj / MoE expert sum) issued
explicitly by `transformer.forward(tp_axis=...)`.

Shard layout (see tp_param_specs):
  * qkv projections: out-features (heads) sharded; o_proj: in-features;
  * MLP gate/up: out-features (ffn); down: in-features;
  * MoE: EXPERT axis sharded (each chip computes its local experts on all
    tokens; the expert sum is the psum — no all-to-all);
  * lm_head: out-features (vocab) sharded -> logits return vocab-sharded,
    downstream (sampling/verification) runs under GSPMD and gathers the
    gamma+1 rows it needs;
  * embedding, norms, router gate, biases on replicated activations:
    replicated; KV cache: kv-heads sharded (append/rollback stay local).

Validated against the single-device forward on the CPU mesh with
interpret-mode Pallas kernels (tests/test_tp_pallas.py); on real chips the
per-chip kernel rate is the measured single-chip 720 GB/s with 1/tp of the
weight bytes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import transformer
from ..models.transformer import ModelParams, QuantizedEmbedding
from .mesh import MODEL_AXIS
from .sharding import _is_expert_stacked, _linear_spec, cache_specs


def tp_param_specs(params: ModelParams) -> ModelParams:
    """PartitionSpecs for the shard_map TP layout (differs from
    sharding.param_specs in that the embedding is REPLICATED — activations
    are replicated inside the shard_map so the lookup must be local)."""
    specs = {}
    for name, w in params.layers.items():
        if name in ("ln1", "ln2"):
            specs[name] = P(None, None)
        elif name == "gate":
            specs[name] = P(None, None, None)
        elif name in ("wgate", "wup", "wdown") and _is_expert_stacked(w):
            specs[name] = _linear_spec(w, None, None, True, (MODEL_AXIS,))
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
    embed = (QuantizedEmbedding(codes=P(None, None), scale=P(None))
             if isinstance(params.embed, QuantizedEmbedding)
             else P(None, None))
    return ModelParams(embed=embed, layers=specs,
                       final_norm=P(None), lm_head=lm)


def shard_params_tp(params: ModelParams, mesh: Mesh) -> ModelParams:
    """device_put `params` with the shard_map TP layout."""
    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s))
    return jax.tree.map(put, params, tp_param_specs(params),
                        is_leaf=lambda x: x is None)


def make_tp_target_forward(cfg: ModelConfig, params: ModelParams):
    """Non-jitted shard_map target forward `(params, tokens, cache) ->
    (logits, cache)` for plugging into the speculative engine
    (`engine.make_generate(..., target_forward=...)`): the engine's while
    loop stays one jit, and inside it the target runs on local Megatron
    shards with Pallas kernels. Logits return vocab-sharded; the verifier's
    gathers happen under GSPMD."""
    assert params.lm_head is not None, \
        "shard_map TP requires an untied lm_head (vocab shards)"
    assert "wqkv" not in params.layers, "TP runs keep the unfused layout"
    pspecs = tp_param_specs(params)
    cspecs = cache_specs()
    return jax.shard_map(
        lambda p, t, c: transformer.forward(cfg, p, t, c,
                                            tp_axis=MODEL_AXIS),
        in_specs=(pspecs, P(), cspecs),
        out_specs=(P(None, None, MODEL_AXIS), cspecs),
        check_vma=False)


def make_tp_server_forward(cfg: ModelConfig, params: ModelParams):
    """SLOT-BATCHED shard_map target forward for the continuous-batching
    SlotEngine (`engine.server.SlotEngine(target_forward=...)`): tokens
    [SLOTS, R, T], caches with a leading slot axis, logits returned
    vocab-sharded. The slot axis is vmapped INSIDE the shard_map so one
    Megatron program (Pallas kernels included) runs the whole pool's verify
    forward per step — the north-star composition of continuous batching
    with the sharded target (BASELINE configs 3+4)."""
    assert params.lm_head is not None, \
        "shard_map TP requires an untied lm_head (vocab shards)"
    assert "wqkv" not in params.layers, "TP runs keep the unfused layout"
    pspecs = tp_param_specs(params)
    from ..engine.kvcache import KVCache
    slot_cs = KVCache(k=P(None, None, None, None, MODEL_AXIS, None),
                      v=P(None, None, None, None, MODEL_AXIS, None),
                      length=P(None), start=P(None, None))
    return jax.shard_map(
        lambda p, t, c: jax.vmap(
            lambda tt, cc: transformer.forward(cfg, p, tt, cc,
                                               tp_axis=MODEL_AXIS))(t, c),
        in_specs=(pspecs, P(), slot_cs),
        out_specs=(P(None, None, None, MODEL_AXIS), slot_cs),
        check_vma=False)


def make_tp_eagle_forward(cfg: ModelConfig, params: ModelParams,
                          feature_layers: Tuple[int, ...]):
    """Non-jitted shard_map target forward for the EAGLE engine:
    `(params, tokens, cache, attn_bias, positions) -> (logits, cache,
    feats)` — tree-attention bias and explicit RoPE positions ride
    replicated; the feature stream returns replicated (it feeds the
    replicated draft head). Plug into
    `engine.eagle_engine.make_eagle_generate(..., target_forward=...)`."""
    assert params.lm_head is not None, \
        "shard_map TP requires an untied lm_head (vocab shards)"
    assert "wqkv" not in params.layers, "TP runs keep the unfused layout"
    pspecs = tp_param_specs(params)
    cspecs = cache_specs()
    rep = P()
    return jax.shard_map(
        lambda p, t, c, ab, pos: transformer.forward(
            cfg, p, t, c, attn_bias=ab, positions=pos,
            feature_layers=feature_layers, tp_axis=MODEL_AXIS),
        in_specs=(pspecs, rep, cspecs, rep, rep),
        out_specs=(P(None, None, MODEL_AXIS), cspecs, rep),
        check_vma=False)


def make_tp_eagle_pool_forward(cfg: ModelConfig, params: ModelParams,
                               feature_layers: Tuple[int, ...]):
    """Slot-BATCHED shard_map target forward for the EAGLE serving pool
    (`engine.eagle_engine.make_eagle_pool` /
    `EagleSlotEngine(batched=True, target_forward=...)`): the 6-arg pool
    signature `(params, tokens [B, T], cache, attn_bias [B, T, T],
    positions [B, T], lengths=[B], staging_at=int)` running
    transformer.forward on local Megatron shards.

    Per-row frontiers (`lengths`) and the staged tree-KV placement are
    head-LOCAL operations — the uniform staging append and the
    staging->frontier compaction touch only the sequence axis of the
    kv-head-sharded cache — so the pool composes with TP at exactly the
    Megatron collectives of the single-request path (hidden psums; logits
    return vocab-sharded). `staging_at` is a static python int, so the
    shard_map closes over it per call (the pool step is jitted — this
    traces once per staging size). The engine's admission prefill calls
    this with the 5-arg form (no lengths/staging), which routes to the
    plain scalar-frontier path."""
    assert params.lm_head is not None, \
        "shard_map TP requires an untied lm_head (vocab shards)"
    assert "wqkv" not in params.layers, "TP runs keep the unfused layout"
    pspecs = tp_param_specs(params)
    cspecs = cache_specs()
    rep = P()

    out_specs = (P(None, None, MODEL_AXIS), cspecs, rep)

    def fwd(p, tokens, cache, attn_bias, positions, lengths=None,
            staging_at=None):
        if lengths is None:
            # 5-arg prefill form: scalar cache frontier, no staging
            return jax.shard_map(
                lambda p_, t_, c_, ab_, pos_: transformer.forward(
                    cfg, p_, t_, c_, attn_bias=ab_, positions=pos_,
                    feature_layers=feature_layers, tp_axis=MODEL_AXIS),
                in_specs=(pspecs, rep, cspecs, rep, rep),
                out_specs=out_specs, check_vma=False)(
                p, tokens, cache, attn_bias, positions)
        return jax.shard_map(
            lambda p_, t_, c_, ab_, pos_, lens_: transformer.forward(
                cfg, p_, t_, c_, attn_bias=ab_, positions=pos_,
                feature_layers=feature_layers, tp_axis=MODEL_AXIS,
                lengths=lens_, staging_at=staging_at),
            in_specs=(pspecs, rep, cspecs, rep, rep, rep),
            out_specs=out_specs, check_vma=False)(
            p, tokens, cache, attn_bias, positions, lengths)

    return fwd


def make_tp_forward(cfg: ModelConfig, params: ModelParams,
                    feature_layers: Optional[Tuple[int, ...]] = None,
                    with_bias: bool = False):
    """Build a shard_map-wrapped `fwd(params, tokens, cache[, attn_bias])`
    running transformer.forward on local Megatron shards (Pallas kernels
    included). Requires the UNFUSED layout, an untied lm_head (vocab
    shards), `jax.set_mesh(mesh)` active, and params placed by
    shard_params_tp. Logits return vocab-sharded on `model`.
    """
    assert params.lm_head is not None, \
        "shard_map TP requires an untied lm_head (vocab shards)"
    assert "wqkv" not in params.layers, "TP runs keep the unfused layout"
    pspecs = tp_param_specs(params)
    cspecs = cache_specs()
    rep = P()

    out_specs = (P(None, None, MODEL_AXIS), cspecs)
    if feature_layers is not None:
        out_specs = out_specs + (rep,)

    if with_bias:
        smapped = jax.shard_map(
            lambda p, t, c, ab: transformer.forward(
                cfg, p, t, c, attn_bias=ab, feature_layers=feature_layers,
                tp_axis=MODEL_AXIS),
            in_specs=(pspecs, rep, cspecs, rep), out_specs=out_specs,
            check_vma=False)  # pallas_call outputs carry no vma info

        @jax.jit
        def fwd(p, tokens, cache, attn_bias):
            return smapped(p, tokens, cache, attn_bias)
    else:
        smapped = jax.shard_map(
            lambda p, t, c: transformer.forward(
                cfg, p, t, c, feature_layers=feature_layers,
                tp_axis=MODEL_AXIS),
            in_specs=(pspecs, rep, cspecs), out_specs=out_specs,
            check_vma=False)  # pallas_call outputs carry no vma info

        @jax.jit
        def fwd(p, tokens, cache):
            return smapped(p, tokens, cache)

    return fwd
