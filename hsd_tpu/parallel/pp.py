"""Pipeline parallelism: layer-sharded target forward over a `pipe` axis.

The reference spreads big targets across GPUs by LAYER-WISE PLACEMENT
(`manual_device_map`, chain-of-thought-hub/gsm8k/
eval_speculative_decoding_llm.py:204-277): each GPU holds a contiguous slice
of decoder layers and activations hop device-to-device through one forward.
This module is the TPU-native equivalent: the layer-stacked parameter arrays
and the layer-stacked KV cache shard on their LAYER axis over a `pipe` mesh
axis, and one `shard_map` program runs the stages in sequence —

  * every device embeds the tokens (cheap, replicated);
  * the stage loop is a STATIC Python unroll over `pp` stages: at step s the
    device with `axis_index == s` runs its local layer slice
    (`transformer.forward(hidden_in=..., skip_head=True)` under `lax.cond`,
    so inactive devices skip the compute entirely), then a `ppermute` hands
    the hidden stream to stage s+1;
  * after the last stage the final hidden broadcasts with one masked psum
    and every device computes final-norm + lm_head on its replicated copy.

Per-chip memory is layers/pp (the point — the reference's 72B target needs
this to fit), per-token latency is the single-chip latency plus pp-1 tiny
ppermutes, exactly like the reference's sequential layer placement. Combine
with TP by nesting meshes is future work; pp composes with `data` for
throughput today.

Works for dense and quantized layer stacks: inside shard_map each device
sees a plain [L/pp, ...] stacked array, so the Pallas scalar-prefetch
kernels run unchanged on the local slice (GSPMD could not partition the
custom call; shard_map sidesteps it the same way parallel.tp does).

Validated against the single-device forward and the full speculative engine
on the CPU mesh (tests/test_pp.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models import transformer
from ..models.transformer import ModelParams, QuantizedEmbedding
from ..ops.linear import QuantizedLinear

PIPE_AXIS = "pipe"


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()[:pp]
    return Mesh(np.asarray(devices).reshape(pp), (PIPE_AXIS,))


def pp_param_specs(params: ModelParams) -> ModelParams:
    """Layer-stacked weights shard on the LAYER axis; embedding / norms /
    head replicate (they serve the replicated activation stream)."""
    def lead_pipe(a):
        return P(PIPE_AXIS, *([None] * (a.ndim - 1)))

    def layer_spec(w):
        if isinstance(w, QuantizedLinear):
            return QuantizedLinear(
                qweight=lead_pipe(w.qweight),
                scales=lead_pipe(w.scales),
                zeros=None if w.zeros is None else lead_pipe(w.zeros),
                perm=None if w.perm is None else lead_pipe(w.perm))
        return lead_pipe(w)

    specs = {k: layer_spec(v) for k, v in params.layers.items()}
    embed = (QuantizedEmbedding(codes=P(None, None), scale=P(None))
             if isinstance(params.embed, QuantizedEmbedding)
             else P(None, None))
    lm = None
    if params.lm_head is not None:
        if isinstance(params.lm_head, QuantizedLinear):
            lm = QuantizedLinear(
                qweight=P(None, None), scales=P(None, None),
                zeros=None if params.lm_head.zeros is None else P(None, None),
                perm=None if params.lm_head.perm is None else P(None))
        else:
            lm = P(None, None)
    return ModelParams(embed=embed, layers=specs,
                       final_norm=P(None), lm_head=lm)


def pp_cache_specs():
    from ..engine.kvcache import KVCache
    return KVCache(k=P(PIPE_AXIS), v=P(PIPE_AXIS), length=P(), start=P(None))


def shard_params_pp(params: ModelParams, mesh: Mesh) -> ModelParams:
    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s))
    return jax.tree.map(put, params, pp_param_specs(params),
                        is_leaf=lambda x: x is None)


def _pp_stage_body(cfg: ModelConfig, pp: int, p, tokens, cache,
                   tp_axis: Optional[str] = None):
    """One device's view of the pipelined forward (runs inside shard_map):
    embed replicated, static unroll over pp stages with lax.cond gating +
    ppermute handoff, masked psum broadcast of the last stage's hidden,
    replicated (or tp-sharded) head."""
    s = jax.lax.axis_index(PIPE_AXIS)
    # replicated embedding (only stage 0's value is consumed)
    if isinstance(p.embed, QuantizedEmbedding):
        rows = jnp.take(p.embed.codes, tokens, axis=0).astype(jnp.float32)
        sc = jnp.take(p.embed.scale, tokens, axis=0).astype(jnp.float32)
        h = (rows * sc[..., None]).astype(cfg.dtype)
    else:
        h = jnp.take(p.embed, tokens, axis=0).astype(cfg.dtype)

    def run(args):
        hh, cc = args
        out, cc2 = transformer.forward(cfg, p, tokens, cc,
                                       hidden_in=hh, skip_head=True,
                                       tp_axis=tp_axis)
        return out.astype(cfg.dtype), cc2

    for stage in range(pp):
        # only the active stage pays its layer slice; lax.cond's
        # predicate varies per device, and neither branch holds a
        # collective, so devices genuinely branch (under TP the predicate
        # is uniform within each model group — all members share the pipe
        # index — so in-branch psums stay consistent)
        h, cache = jax.lax.cond(s == stage, run, lambda a: a, (h, cache))
        if stage < pp - 1:
            h = jax.lax.ppermute(
                h, PIPE_AXIS, [(i, i + 1) for i in range(pp - 1)])

    # broadcast the last stage's hidden, then the head on every device
    h = jax.lax.psum(
        jnp.where(s == pp - 1, h.astype(jnp.float32), 0.0), PIPE_AXIS)
    x = transformer.rms_norm(h.astype(cfg.dtype), p.final_norm,
                             cfg.rms_norm_eps)
    head = p.embed.T if p.lm_head is None else p.lm_head
    from ..ops.linear import apply_linear
    logits = apply_linear(head, x, path=cfg.gptq_path).astype(jnp.float32)
    return logits, cache


def make_pp_target_forward(cfg: ModelConfig, params: ModelParams, pp: int):
    """Non-jitted shard_map target forward `(params, tokens, cache) ->
    (logits, cache)` over the `pipe` axis, for
    `engine.make_generate(..., target_forward=...)`. `pp` must divide
    cfg.num_layers; run under a mesh containing PIPE_AXIS of size pp."""
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    pspecs = pp_param_specs(params)
    cspecs = pp_cache_specs()
    return jax.shard_map(
        lambda p, t, c: _pp_stage_body(cfg, pp, p, t, c),
        in_specs=(pspecs, P(), cspecs),
        out_specs=(P(), cspecs),
        check_vma=False)


def make_pp_server_forward(cfg: ModelConfig, params: ModelParams, pp: int):
    """SLOT-BATCHED pipelined target forward for the continuous-batching
    SlotEngine (`engine.server.SlotEngine(target_forward=...)`): tokens
    [SLOTS, R, T], caches with a leading slot axis. The slot axis is vmapped
    INSIDE the shard_map, so one pipelined program serves the whole pool per
    step (the serving analog of the reference running multidraft against a
    dispatch_model-sharded target, chain-of-thought-hub/gsm8k/
    eval_speculative_decoding_llm.py:256-260)."""
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    pspecs = pp_param_specs(params)
    cs = pp_cache_specs()
    from ..engine.kvcache import KVCache
    slot_cs = KVCache(k=P(None, PIPE_AXIS), v=P(None, PIPE_AXIS),
                      length=P(None), start=P(None, None))
    return jax.shard_map(
        lambda p, t, c: jax.vmap(
            lambda tt, cc: _pp_stage_body(cfg, pp, p, tt, cc))(t, c),
        in_specs=(pspecs, P(), slot_cs),
        out_specs=(P(), slot_cs),
        check_vma=False)


# ---------------------------------------------------------------------------
# PP x TP composition: pipe stages of Megatron-sharded layers — the
# production layout for 72B-class targets (e.g. pp=2 x tp=4 on 8 chips:
# per-chip weight bytes = layers/pp * shard/tp).
# ---------------------------------------------------------------------------

def make_pp_tp_mesh(pp: int, tp: int, devices=None) -> Mesh:
    import numpy as np
    from .mesh import MODEL_AXIS
    devices = devices if devices is not None else jax.devices()[:pp * tp]
    return Mesh(np.asarray(devices).reshape(pp, tp), (PIPE_AXIS, MODEL_AXIS))


def pp_tp_param_specs(params: ModelParams) -> ModelParams:
    """tp_param_specs with the layer (leading) axis additionally sharded
    over `pipe`."""
    from .tp import tp_param_specs

    def add_pipe(spec):
        if spec is None:
            return None
        if isinstance(spec, QuantizedLinear):
            return QuantizedLinear(*(add_pipe(s) for s in spec))
        if isinstance(spec, P) and len(spec) >= 1 and spec[0] is None:
            return P(PIPE_AXIS, *spec[1:])
        return spec

    tps = tp_param_specs(params)
    layers = {k: add_pipe(v) for k, v in tps.layers.items()}
    return ModelParams(embed=tps.embed, layers=layers,
                       final_norm=tps.final_norm, lm_head=tps.lm_head)


def pp_tp_cache_specs():
    from ..engine.kvcache import KVCache
    from .mesh import MODEL_AXIS
    return KVCache(k=P(PIPE_AXIS, None, None, MODEL_AXIS, None),
                   v=P(PIPE_AXIS, None, None, MODEL_AXIS, None),
                   length=P(), start=P(None))


def shard_params_pp_tp(params: ModelParams, mesh: Mesh) -> ModelParams:
    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s))
    return jax.tree.map(put, params, pp_tp_param_specs(params),
                        is_leaf=lambda x: x is None)


def make_pp_tp_target_forward(cfg: ModelConfig, params: ModelParams,
                              pp: int):
    """Pipe stages whose layer slices run MEGATRON-sharded over `model`
    (transformer.forward(tp_axis=...) psums inside each stage; the lax.cond
    predicate is uniform within a model group — every member shares the
    pipe index — so the in-branch psums stay consistent). Logits return
    vocab-sharded on `model`, like parallel.tp."""
    from .mesh import MODEL_AXIS
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    assert params.lm_head is not None, \
        "PPxTP requires an untied lm_head (vocab shards)"
    pspecs = pp_tp_param_specs(params)
    cspecs = pp_tp_cache_specs()
    return jax.shard_map(
        lambda p, t, c: _pp_stage_body(cfg, pp, p, t, c, tp_axis=MODEL_AXIS),
        in_specs=(pspecs, P(), cspecs),
        out_specs=(P(None, None, "model"), cspecs),
        check_vma=False)
