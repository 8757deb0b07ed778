"""Unified Qwen2/Llama/Mixtral decoder in pure functional JAX.

One model stack serves draft and target (the reference carries three:
stock HF, patched HF, and vendored EAGLE models — SURVEY.md §7). Parameters
are a plain pytree with all decoder layers STACKED on a leading axis and the
forward pass runs `lax.scan` over layers: one compiled layer body regardless
of depth (fast compiles, XLA-friendly), the standard TPU idiom.

Supports:
  * GQA attention with RoPE (NeoX rotate-half), optional qkv bias (Qwen2),
  * SwiGLU MLP, RMSNorm (fp32 accumulation),
  * external static KV cache (engine/kvcache.py) with length-masked attention,
  * optional additive attention bias (the EAGLE tree mask becomes a bias,
    ref: modeling_llama_kv.py:1036-1042),
  * per-matmul pluggable quantized weights (ops/gptq.py pytrees).

Weights are bf16 by default; attention logits, softmax and norms accumulate
in fp32 (MXU-friendly).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..engine.kvcache import (KVCache, append_layer_stacked,
                              append_layer_stacked_ragged)
from ..ops.linear import (apply_attn_mlp, apply_linear, apply_mlp,
                          attn_mlp_fusable, init_dense)


class QuantizedEmbedding(NamedTuple):
    """Per-row int8 embedding: row v dequantizes as codes[v] * scale[v].
    Halves the embedding-table HBM footprint (the last bf16 holdout in a
    fully-int8 target, docs/BENCHMARKS.md scale-stress section)."""

    codes: jax.Array    # [V, D] int8
    scale: jax.Array    # [V] float32/bf16


def quantize_embedding(embed: jax.Array) -> QuantizedEmbedding:
    w = embed.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-8) / 127.0
    codes = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return QuantizedEmbedding(codes=codes, scale=scale)


class ModelParams(NamedTuple):
    """Pytree of model weights. `layers` leaves carry a leading [L] axis."""

    embed: Any                  # [V, D] array or QuantizedEmbedding
    layers: Dict[str, Any]
    final_norm: jax.Array       # [D]
    lm_head: Any                # [D, V] / QuantizedLinear / None when tied


def init_params(cfg: ModelConfig, key: jax.Array) -> ModelParams:
    """Random init (tests / benchmarks with synthetic weights)."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    keys = iter(jax.random.split(key, 16))

    def dense(k, shape, scale=None):
        scale = scale if scale is not None else (shape[0] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    layers = dict(
        ln1=jnp.ones((L, D), jnp.float32),
        ln2=jnp.ones((L, D), jnp.float32),
        wq=dense(next(keys), (L, D, H * hd)),
        wk=dense(next(keys), (L, D, Hkv * hd)),
        wv=dense(next(keys), (L, D, Hkv * hd)),
        wo=dense(next(keys), (L, H * hd, D)),
    )
    if cfg.is_moe:
        # Mixtral-style sparse MoE: router gate [D, E] + per-expert SwiGLU
        # stacks [E, D, F] (ref: modeling_mixtral_kv.py:426-516 gate/w1/w3/w2)
        E = cfg.num_experts
        layers.update(
            gate=dense(next(keys), (L, D, E)).astype(jnp.float32),
            wgate=dense(next(keys), (L, E, D, F), scale=D ** -0.5),
            wup=dense(next(keys), (L, E, D, F), scale=D ** -0.5),
            wdown=dense(next(keys), (L, E, F, D), scale=F ** -0.5),
        )
    else:
        layers.update(
            wgate=dense(next(keys), (L, D, F)),
            wup=dense(next(keys), (L, D, F)),
            wdown=dense(next(keys), (L, F, D)),
        )
    if cfg.attention_bias:
        layers.update(
            bq=jnp.zeros((L, H * hd), cfg.dtype),
            bk=jnp.zeros((L, Hkv * hd), cfg.dtype),
            bv=jnp.zeros((L, Hkv * hd), cfg.dtype),
        )
    embed = dense(next(keys), (cfg.vocab_size, D), scale=0.02)
    lm_head = None if cfg.tie_word_embeddings else dense(next(keys), (D, cfg.vocab_size))
    return ModelParams(embed=embed, layers=layers,
                       final_norm=jnp.ones((D,), jnp.float32), lm_head=lm_head)


def fuse_params(cfg: ModelConfig, params: ModelParams) -> ModelParams:
    """Fuse qkv and gate|up projections into single matmuls (out-features
    concatenated) — fewer ops per layer, which is the dominant cost in the
    per-op-overhead-bound single-token decode regime (docs/BENCHMARKS.md).

    Single-chip / replicated layout only: the fused out-features axis does
    not align with head-granular tensor-parallel shards, so TP runs keep the
    unfused layout (Megatron-style interleaving is future work).
    Works for dense and QuantizedLinear weights (codes/scales/zeros
    concatenate on the out axis).
    """
    from ..ops.linear import QuantizedLinear

    L = dict(params.layers)

    def cat(ws):
        if isinstance(ws[0], QuantizedLinear):
            # q/k/v are quantized independently, so desc_act act-orders can
            # differ per projection — fusing them into one matmul would need
            # one shared activation gather, which only exists if the perms
            # coincide (they share the same input stream).
            perms = [w.perm for w in ws]
            if any(p is not None for p in perms):
                assert all(p is not None and
                           bool(jnp.array_equal(p, perms[0]))
                           for p in perms), \
                    "cannot fuse desc_act projections with differing g_idx"
            return QuantizedLinear(
                qweight=jnp.concatenate([w.qweight for w in ws], axis=-1),
                scales=jnp.concatenate([w.scales for w in ws], axis=-1),
                zeros=None if ws[0].zeros is None else
                jnp.concatenate([w.zeros for w in ws], axis=-1),
                perm=perms[0])
        return jnp.concatenate(ws, axis=-1)

    L["wqkv"] = cat([L.pop("wq"), L.pop("wk"), L.pop("wv")])
    if "bq" in L:
        L["bqkv"] = jnp.concatenate([L.pop("bq"), L.pop("bk"), L.pop("bv")],
                                    axis=-1)
    if "gate" not in L:  # MoE expert stacks stay unfused (per-expert matmuls)
        L["wgu"] = cat([L.pop("wgate"), L.pop("wup")])
    return params._replace(layers=L)


def _moe_ffn(cfg: ModelConfig, lp: Dict[str, Any], h: jax.Array,
             tp_axis: Optional[str] = None) -> jax.Array:
    """Sparse-MoE SwiGLU block (Mixtral family). h: [B, T, D] -> [B, T, D].

    TPU-first formulation of the reference's MixtralSparseMoeBlock
    (modeling_mixtral_kv.py:449-516): instead of a per-expert Python loop over
    host-synced `torch.where` index lists (:495-513), every expert runs on
    every token as one fixed-shape batched matmul and the top-k routing
    weights (exact zeros for unselected experts) scale the expert sum. At
    decode-sized T this keeps the MXU busy with static shapes, and under
    expert-parallel sharding (parallel/sharding.py expert_parallel=True) each
    device streams only its local experts and the expert sum compiles to one
    psum — no all-to-all, no capacity/dropping logic.

    Router math matches the reference exactly: fp32 softmax over all experts
    (:480), top-k, renormalize over the selected k (:482).
    """
    B, T, D = h.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    x = h.reshape(B * T, D)
    router = jnp.einsum("nd,de->ne", x.astype(jnp.float32),
                        lp["gate"].astype(jnp.float32))
    probs = jax.nn.softmax(router, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, K)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    # [N, E] dense routing weights, zero for unselected experts
    weights = jnp.sum(jax.nn.one_hot(top_i, E, dtype=jnp.float32)
                      * top_w[..., None], axis=1)
    if tp_axis is not None:
        # expert parallelism inside shard_map: this shard holds experts
        # [off, off + E_local); the router (replicated gate) scored ALL
        # experts, so slice our columns and psum the expert sum below
        E_local = (lp["wgate"].qweight if hasattr(lp["wgate"], "qweight")
                   else lp["wgate"]).shape[0]
        off = jax.lax.axis_index(tp_axis) * E_local
        weights = jax.lax.dynamic_slice_in_dim(weights, off, E_local, axis=1)
    # vmap over the expert axis works for dense arrays and QuantizedLinear
    # pytrees alike (each leaf carries the [E] leading axis)
    pth = cfg.gptq_path
    g = jax.vmap(lambda w: apply_linear(w, x, path=pth))(lp["wgate"])
    u = jax.vmap(lambda w: apply_linear(w, x, path=pth))(lp["wup"])
    act = jax.nn.silu(g) * u                                  # [E, N, F]
    out = jax.vmap(lambda w, a: apply_linear(w, a, path=pth))(
        lp["wdown"], act)                                     # [E, N, D]
    y = jnp.einsum("ne,end->nd", weights, out.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y.reshape(B, T, D).astype(h.dtype)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _rope_tables(positions: jax.Array, d: int, theta: float, scaling=None):
    """Precompute the (cos, sin) rotation tables [B, T, 1, d/2] for a step's
    positions ONCE — they are layer-invariant, but computing them inside the
    layer scan body re-ran freqs/cos/sin twice per layer (96 tiny
    transcendental ops per 48-layer decode step).

    scaling: optional Llama-3.1 frequency-dependent scaling tuple
    (factor, low_freq_factor, high_freq_factor, original_max_position) —
    long wavelengths (past the original context) are slowed by `factor`,
    short ones kept, with a smooth ramp between (HF LlamaConfig
    rope_scaling rope_type="llama3" semantics)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if scaling is not None:
        factor, lo_f, hi_f, orig = scaling
        wavelen = 2.0 * jnp.pi / freqs
        ramp = (orig / wavelen - lo_f) / (hi_f - lo_f)
        smooth = jnp.clip(ramp, 0.0, 1.0)
        freqs = ((1.0 - smooth) * freqs / factor + smooth * freqs)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, d/2]
    return jnp.cos(angles)[:, :, None, :], jnp.sin(angles)[:, :, None, :]


def _rope_apply(x: jax.Array, tables) -> jax.Array:
    """Rotate-half with precomputed tables. x: [B, T, H, d]."""
    cos, sin = tables
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float,
          scaling=None) -> jax.Array:
    """NeoX-style rotate-half RoPE. x: [B, T, H, d], positions: [B, T]."""
    return _rope_apply(x, _rope_tables(positions, x.shape[-1], theta,
                                       scaling))


def _attention(q, k, v, q_index, kv_length, start, attn_bias,
               staging_at=None, mask=None):
    """q: [B,T,H,d]; k,v: [B,S,Hkv,d] (full cache buffers).

    Causal + cache-validity masking by cache index — the static-shape
    replacement for the reference's dynamic cache slicing. `q_index` [B, T]
    are cache-slot indices of the queries; `start` [B] marks dead left-pad
    slots. attn_bias, if given, is [T, T] additive bias applied on the
    self-block (used for tree attention); `kv_length` locates that block and
    may be per-row [B] (slot-batched serving: rows at divergent frontiers).

    staging_at (static int): tree-attention STAGING mode — the T new keys
    live at the FIXED buffer tail [staging_at, staging_at+T) for every row
    (so their append is a uniform dynamic_update_slice even when rows sit at
    divergent frontiers — the per-row scatter append measured ~100 ms/block
    at B=4, 8B geometry). Masking becomes `committed-prefix OR staging
    block`; attn_bias must be per-row [B, T, T] and already carries -inf
    for non-ancestor pairs, which is what keeps the staging block causal.
    """
    from ..ops.flash_decode import flash_attention_decode, use_flash
    if use_flash(q, k) and jnp.ndim(kv_length) == 0 and staging_at is None:
        # long-cache decode regime: stream the cache once with online
        # softmax instead of materializing [Hkv, rep, T, S] fp32 scores
        # (ops/flash_decode.py; same masking/bias semantics as below)
        return flash_attention_decode(q, k, v, q_index, kv_length, start,
                                      attn_bias)
    B, T, H, d = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    # GQA as a grouped einsum over [kv_head, rep] — NEVER materialize the
    # repeated K/V: jnp.repeat wrote rep x the cache bytes per layer per
    # step, the dominant long-context cost (measured ~2ms/step/1024 slots at
    # 14B geometry before this; KV-read speed-of-light is ~0.03ms).
    qg = q.reshape(B, T, Hkv, rep, d)
    scores = jnp.einsum("btkrd,bskd->bkrts", qg, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (d ** -0.5)
    if staging_at is not None:
        # staged tree attention: every query sees its row's committed
        # prefix plus the staging block; the bias (placed at the static
        # staging offset — no gather) encodes ancestor structure
        kp = jnp.arange(S)[None, :]
        kv_len = jnp.broadcast_to(jnp.atleast_1d(kv_length), (B,))
        prefix = ((kp < kv_len[:, None]) & (kp >= start[:, None]))  # [B,S]
        in_stage = (jnp.arange(S) >= staging_at) & \
                   (jnp.arange(S) < staging_at + T)                 # [S]
        bias = jnp.pad(attn_bias.astype(jnp.float32),
                       ((0, 0), (0, 0),
                        (staging_at, S - staging_at - T)))          # [B,T,S]
        mask = prefix[:, None, :] | in_stage[None, None, :]         # [B,T,S]
        scores = scores + bias[:, None, None, :, :]
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bkrts,bskd->btkrd", probs, v)
        return out.reshape(B, T, H, d)
    if mask is None:
        # layer-invariant: forward() precomputes this once outside the
        # layer scan (decode is small-op-launch-bound; ~5 mask ops per
        # layer x 48 layers was measurable overhead)
        key_pos = jnp.arange(S)[None, None, None, None, :]
        qp = q_index[:, None, None, :, None]  # [B,1,1,T,1]
        mask = (key_pos <= qp) & (key_pos >= start[:, None, None, None,
                                                   None])
    if attn_bias is not None:
        # Tree attention: attn_bias is a [T, T] (or per-row [B, T, T])
        # additive bias over the new tokens (the draft trie); it lands on
        # the keys written this call, i.e. cache positions
        # [kv_length, kv_length + T) — per row when kv_length is [B].
        base = jnp.broadcast_to(jnp.atleast_1d(kv_length), (B,))
        kidx = jnp.clip(jnp.arange(S)[None, :] - base[:, None], 0, T - 1)
        self_block = ((jnp.arange(S)[None, :] >= base[:, None])
                      & (jnp.arange(S)[None, :] < base[:, None] + T))
        ab = jnp.broadcast_to(
            attn_bias if attn_bias.ndim == 3 else attn_bias[None],
            (B, T, T))
        bias = jnp.take_along_axis(
            ab, jnp.broadcast_to(kidx[:, None, :], (B, T, S)), axis=2)
        bias = jnp.where(self_block[:, None, :], bias, 0.0)
        scores = scores + bias[:, None, None, :, :]
    # large-negative (not -inf) so fully-masked pad rows stay finite: a NaN
    # softmax row would poison every later layer through 0 * NaN in the
    # value matmul.
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkrts,bskd->btkrd", probs, v)
    return out.reshape(B, T, H, d)


def forward(cfg: ModelConfig, params: ModelParams, tokens: jax.Array,
            cache: KVCache, attn_bias: Optional[jax.Array] = None,
            positions: Optional[jax.Array] = None,
            feature_layers: Optional[Tuple[int, ...]] = None,
            tp_axis: Optional[str] = None,
            hidden_in: Optional[jax.Array] = None,
            skip_head: bool = False,
            ring_axis: Optional[str] = None,
            lengths: Optional[jax.Array] = None,
            staging_at: Optional[int] = None):
    """Run the decoder over `tokens` [B, T] appending to `cache`.

    Returns (logits [B, T, V] float32, updated cache with length += T).
    With `feature_layers` (static tuple of layer indices) additionally returns
    the concatenated INPUTS of those layers [B, T, len*D] — the EAGLE-3
    feature stream (the reference taps layers {2, L//2, L-3},
    modeling_llama_kv.py:1138).

    tp_axis: set when running INSIDE a shard_map over that mesh axis
    (parallel.tp.make_tp_forward): weights/KV arrive as LOCAL Megatron
    shards (heads / ffn / experts / vocab split), activations replicated;
    this function then psums the row-sharded matmuls (o_proj, down_proj,
    MoE expert sum) explicitly. This is how the Pallas kernels run under
    tensor parallelism — GSPMD cannot partition the custom call.

    hidden_in / skip_head: pipeline-parallel stage hooks (parallel.pp):
    a mid-pipeline stage enters with the previous stage's hidden stream
    instead of embedding `tokens`, and exits with the RAW pre-final-norm
    hidden (in place of logits) for the next stage. `tokens` is still used
    for shapes/positions.

    ring_axis: sequence-parallel PREFILL (parallel.sp): running inside a
    shard_map whose `ring_axis` shards the TOKEN axis, attention runs as
    exact ring attention over the travelling K/V blocks
    (ops/ring_attention.py) instead of against the cache buffer. Requires
    an empty local cache (prefill-from-scratch) and explicit GLOBAL
    `positions`.

    lengths: optional per-ROW cache frontiers [B] int32, replacing the
    scalar `cache.length` (slot-batched serving, engine/eagle_server: slots
    committed different token counts, but one program must run them all so
    the quantized matvec kernels see the stacked [B*T] activation plane and
    stream the weights ONCE — vmapping the per-slot forward would extend
    the Pallas grid and re-stream per slot). Appends scatter per row;
    `cache.length` is left untouched (the caller tracks rows itself).

    staging_at (static int, requires `lengths` + `attn_bias` [B, T, T]):
    write the T new keys at the FIXED region [staging_at, staging_at+T) of
    every row instead of each row's frontier — a uniform
    dynamic_update_slice where the per-row append needs an XLA scatter
    (measured ~3 ms/layer at B=4). The caller compacts accepted entries
    from staging into the frontier afterwards
    (kvcache.compact_path_staged).
    """
    B, T = tokens.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    if tp_axis is not None:
        tp = jax.lax.axis_size(tp_axis)
        assert H % tp == 0 and Hkv % tp == 0, (H, Hkv, tp)
        H, Hkv = H // tp, Hkv // tp

    def reduce_tp(y):
        return jax.lax.psum(y, tp_axis) if tp_axis is not None else y
    if lengths is not None:
        q_index = lengths[:, None] + jnp.arange(T)[None, :].astype(jnp.int32)
    else:
        q_index = cache.length + jnp.arange(T)[None, :].astype(jnp.int32)
        q_index = jnp.broadcast_to(q_index, (B, T))
    if positions is None:
        # RoPE positions discount the dead left-pad region
        positions = jnp.maximum(q_index - cache.start[:, None], 0)
    # rotation tables are layer-invariant: build once OUTSIDE the layer scan
    rope_tables = _rope_tables(positions, hd, cfg.rope_theta,
                               cfg.rope_scaling)
    # rope-fused attention kernel (ops/flash_decode, opt-in): absorbs the
    # per-layer rope(q) + mask + softmax launches into one kernel in the
    # launch-bound short-cache decode regime
    from ..ops.flash_decode import use_fused_rope_attn
    fused_rope_attn = (ring_axis is None and staging_at is None
                       and lengths is None and attn_bias is None
                       and use_fused_rope_attn(B, T, hd, cache.k.shape[2]))
    # the attention validity mask is layer-invariant too; hoist it out of
    # the scan (non-staged path only — the staged mask couples to the bias)
    dec_mask = None
    if ring_axis is None and staging_at is None:
        S_ = cache.k.shape[2]
        key_pos = jnp.arange(S_)[None, None, None, None, :]
        qp = q_index[:, None, None, :, None]
        dec_mask = (key_pos <= qp) & (key_pos >= cache.start[:, None, None,
                                                             None, None])

    if hidden_in is not None:
        x = hidden_in.astype(cfg.dtype)
    elif isinstance(params.embed, QuantizedEmbedding):
        rows = jnp.take(params.embed.codes, tokens, axis=0).astype(jnp.float32)
        sc = jnp.take(params.embed.scale, tokens, axis=0).astype(jnp.float32)
        x = (rows * sc[..., None]).astype(cfg.dtype)
    else:
        x = jnp.take(params.embed, tokens, axis=0).astype(cfg.dtype)

    from ..ops.linear import QuantizedLinear

    # layer-stacked QuantizedLinear weights are NOT scanned over: XLA lowers
    # a scan body's per-layer slice of a custom-call operand to a
    # materialized dynamic-slice copy (3x weight HBM traffic at 14B shapes —
    # docs/BENCHMARKS.md). They stay whole and the Pallas kernel selects the
    # layer via scalar-prefetch index maps (apply_linear(..., layer=idx)).
    # MoE expert stacks ([L, E, ...]) keep the scan slicing.
    names = params.layers
    qnames = frozenset(
        k for k, v in names.items()
        if isinstance(v, QuantizedLinear) and v.qweight.ndim == 3)
    xs_layers = {k: v for k, v in names.items() if k not in qnames}
    nL = next(iter(names.values()))
    nL = (nL.qweight if isinstance(nL, QuantizedLinear) else nL).shape[0]

    def layer_fn(carry, inp):
        # the KV cache rides the CARRY (not xs/ys): in-place stacked update +
        # read slice fused into the attention einsum = one cache read pass
        # per step (xs slicing + ys re-stacking costs ~1.5x — kvcache.py
        # append_layer_stacked)
        x, k_all, v_all = carry
        lp, idx = inp

        def lin(name, h, bias=None, rms=None):
            if name in qnames:
                return apply_linear(names[name], h, bias, layer=idx,
                                    path=cfg.gptq_path, rms=rms,
                                    mxu_bf16=cfg.gptq_mxu_bf16)
            return apply_linear(lp[name], h, bias, path=cfg.gptq_path,
                                rms=rms, mxu_bf16=cfg.gptq_mxu_bf16)

        x_in = x
        if "wqkv" in names:
            # fused single-chip layout (fuse_params): one matmul for q|k|v,
            # with the input RMS norm fused into the quantized kernel's
            # activation read when supported (apply_linear rms=)
            qkv = lin("wqkv", x, lp.get("bqkv"),
                      rms=(lp["ln1"], cfg.rms_norm_eps))
            q = qkv[..., :H * hd]
            k = qkv[..., H * hd:(H + Hkv) * hd]
            v = qkv[..., (H + Hkv) * hd:]
        else:
            # unfused q/k/v: 3 consumers -> norm once in XLA
            h = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
            q = lin("wq", h, lp.get("bq"))
            k = lin("wk", h, lp.get("bk"))
            v = lin("wv", h, lp.get("bv"))
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, Hkv, hd)
        v = v.reshape(B, T, Hkv, hd)
        if not fused_rope_attn:
            q = _rope_apply(q, rope_tables)
        k = _rope_apply(k, rope_tables)
        if staging_at is not None:
            k_all, v_all = append_layer_stacked(k_all, v_all, idx,
                                                jnp.int32(staging_at), k, v)
        elif lengths is not None:
            k_all, v_all = append_layer_stacked_ragged(k_all, v_all, idx,
                                                       lengths, k, v)
        else:
            k_all, v_all = append_layer_stacked(k_all, v_all, idx,
                                                cache.length, k, v)
        if ring_axis is not None:
            from ..ops.ring_attention import ring_attention
            att = ring_attention(q, k, v, positions, ring_axis
                                 ).astype(q.dtype)
        else:
            k_buf = jax.lax.dynamic_index_in_dim(k_all, idx, 0,
                                                 keepdims=False)
            v_buf = jax.lax.dynamic_index_in_dim(v_all, idx, 0,
                                                 keepdims=False)
            if fused_rope_attn:
                from ..ops.flash_decode import flash_attention_decode
                att = flash_attention_decode(
                    q, k_buf, v_buf, q_index, cache.length, cache.start,
                    attn_bias, rope=rope_tables).astype(q.dtype)
            else:
                att = _attention(
                    q, k_buf, v_buf, q_index,
                    lengths if lengths is not None else cache.length,
                    cache.start, attn_bias, staging_at=staging_at,
                    mask=dec_mask)
        att2 = att.reshape(B, T, H * hd)
        if ("wgu" in names and tp_axis is None
                and {"wo", "wgu", "wdown"} <= qnames
                and attn_mlp_fusable(att2, names["wo"], names["wgu"],
                                     names["wdown"], path=cfg.gptq_path,
                                     layer=idx)):
            # decode-regime packed-int4 layer tail: wo + residual + SwiGLU
            # MLP + residual as ONE pallas_call (2 kernels per layer total)
            x = apply_attn_mlp(att2, x, names["wo"], names["wgu"],
                               names["wdown"], lp["ln2"],
                               cfg.rms_norm_eps, layer=idx)
            return (x, k_all, v_all), (x_in if collect_inputs else None)
        x = x + reduce_tp(lin("wo", att2))
        if "gate" in names:
            h = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
            x = x + _moe_ffn(cfg, lp, h, tp_axis=tp_axis)
        elif "wgu" in names:
            assert tp_axis is None, "TP runs keep the unfused layout"
            if "wgu" in qnames and "wdown" in qnames:
                # stacked quantized pair: the whole SwiGLU block goes
                # through one dispatcher — a single fused pallas_call when
                # supported (ops/linear.apply_mlp), else the same two-call
                # composition as below
                x = x + apply_mlp(names["wgu"], names["wdown"], x,
                                  lp["ln2"], cfg.rms_norm_eps, layer=idx,
                                  path=cfg.gptq_path,
                                  mxu_bf16=cfg.gptq_mxu_bf16)
            else:
                wdown = names["wdown"]
                F = wdown.din if isinstance(wdown, QuantizedLinear) \
                    else wdown.shape[-2]  # logical in-dim (packed-int4 aware)
                gu = lin("wgu", x, rms=(lp["ln2"], cfg.rms_norm_eps))
                ff = jax.nn.silu(gu[..., :F]) * gu[..., F:]
                x = x + lin("wdown", ff)
        else:
            h = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
            ff = jax.nn.silu(lin("wgate", h)) * lin("wup", h)
            x = x + reduce_tp(lin("wdown", ff))
        if collect_inputs:
            return (x, k_all, v_all), x_in
        return (x, k_all, v_all), None

    collect_inputs = (feature_layers is not None
                      and tuple(feature_layers) != (-1,))
    idxs = jnp.arange(nL, dtype=jnp.int32)
    (x, k_new, v_new), layer_inputs = jax.lax.scan(
        layer_fn, (x, cache.k, cache.v), (xs_layers, idxs))
    if collect_inputs:
        feats = jnp.concatenate([layer_inputs[i] for i in feature_layers],
                                axis=-1)
    else:
        # feature_layers == (-1,): EAGLE-1/2 stream = final pre-norm hidden
        feats = x
    if skip_head:
        new_cache = cache._replace(k=k_new, v=v_new, length=cache.length + T)
        if feature_layers is not None:
            return x, new_cache, feats
        return x, new_cache
    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
    if params.lm_head is None:
        assert not isinstance(params.embed, QuantizedEmbedding), \
            "tied head requires a dense embedding (use an untied " \
            "QuantizedLinear lm_head with QuantizedEmbedding)"
        head = params.embed.T
    else:
        head = params.lm_head
    logits = apply_linear(head, x, path=cfg.gptq_path,
                          mxu_bf16=cfg.gptq_mxu_bf16).astype(jnp.float32)
    new_cache = cache._replace(k=k_new, v=v_new, length=cache.length + T)
    if feature_layers is not None:
        return logits, new_cache, feats
    return logits, new_cache
