"""Synthetic draft/target model pairs for checkpoint-free benchmarking.

The reference's headline numbers are a trained 0.5B draft speculating for
trained 14B/32B/72B targets (ref: README.md:121-125,
chain-of-thought-hub/gsm8k/eval_speculative_decoding_llm.py:37,63). With no
network access there are no trained checkpoints, and two independently random
models of different sizes agree at chance level — speculative decoding would
measure nothing. This module provides the honest substitute: a **coupled
target** whose per-token cost is the full big-geometry forward but whose
output distribution is engineered to agree with the small draft at a
calibrated rate.

Construction:

    q  = softmax(small_int8(x))                    # the draft (0.5B cost)
    p  = softmax(small_bf16(x) + lam * zbig(x))    # the target (14B cost)

where `small_int8` is the GPTQ-int8 quantization of the same small trunk
(round-trip quantization error is the base divergence mechanism — exactly the
reference's GPTQ setting) and `zbig` is the big model's per-position
standardized logits (mean 0 / std 1 over the vocab axis, so `lam` is in
logit-std units). `p` is a genuine fixed distribution over contexts: all
losslessness properties of the verifiers apply unchanged, block efficiency
emerges from real verification math on real sampled tokens, and every
committed token requires the full big forward — so tok/s is measured at the
true draft/target compute ratio.

The coupled target keeps two KV caches (big + small trunk); the engine
threads them through `make_generate(target_cache_ops=...)`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..engine.kvcache import KVCache, init_cache, rollback, select_draft_row
from ..models import transformer
from ..models.transformer import ModelParams, QuantizedEmbedding, fuse_params
from ..ops.linear import QuantizedLinear, pack_int4, quantize


class CoupledCache(NamedTuple):
    big: KVCache
    small: KVCache


class CoupledParams(NamedTuple):
    big: ModelParams
    small: ModelParams
    lam: jax.Array   # scalar f32 — weight of the standardized big logits


def make_coupled_target(cfg_small: ModelConfig, cfg_big: ModelConfig):
    """Return `(forward, cache_ops)` for the coupled target.

    forward(params: CoupledParams, tokens, cache: CoupledCache)
        -> (logits f32, cache)
    cache_ops = (init, rollback, select) per make_generate's protocol.
    """
    assert cfg_small.vocab_size == cfg_big.vocab_size

    def forward(params: CoupledParams, tokens, cache: CoupledCache):
        big_logits, bigc = transformer.forward(
            cfg_big, params.big, tokens, cache.big)
        small_logits, smallc = transformer.forward(
            cfg_small, params.small, tokens, cache.small)
        mu = jnp.mean(big_logits, axis=-1, keepdims=True)
        sd = jnp.std(big_logits, axis=-1, keepdims=True) + 1e-6
        logits = small_logits + params.lam * (big_logits - mu) / sd
        return logits, CoupledCache(big=bigc, small=smallc)

    def init(batch, max_len, start):
        return CoupledCache(
            big=init_cache(cfg_big, batch, max_len)._replace(start=start),
            small=init_cache(cfg_small, batch, max_len)._replace(start=start))

    def rb(cache: CoupledCache, new_length):
        return CoupledCache(big=rollback(cache.big, new_length),
                            small=rollback(cache.small, new_length))

    def sel(cache: CoupledCache, row):
        return CoupledCache(big=select_draft_row(cache.big, row),
                            small=select_draft_row(cache.small, row))

    return forward, (init, rb, sel)


def _gs(din: int) -> int:
    """Quantization group size: 128 (the GPTQ default) when it divides the
    in-features, else one group per matrix (tiny test geometries)."""
    return 128 if din % 128 == 0 else din


@functools.partial(jax.jit, static_argnames=("din", "dout", "layers", "bits"))
def _init_q(key, din: int, dout: int, layers: int, bits: int = 4):
    """Device-side random quantized weight stack [layers, ...] (symmetric,
    group 128). Codes are generated per layer under lax.map so the PRNG's u32
    intermediates never materialize at full [L, in, out] size."""
    kc, ks = jax.random.split(key)
    if bits == 4:
        gen = lambda k: pack_int4(
            jax.random.randint(k, (din, dout), -8, 8, jnp.int8))
    else:
        gen = lambda k: jax.random.randint(k, (din, dout), -127, 128, jnp.int8)
    codes = jax.lax.map(gen, jax.random.split(kc, layers))
    scales = (jnp.abs(jax.random.normal(ks, (layers, din // _gs(din), dout)))
              * 1e-2 + 1e-3).astype(jnp.bfloat16)
    return QuantizedLinear(qweight=codes, scales=scales, zeros=None)


def init_quantized_params(cfg: ModelConfig, key: jax.Array,
                          bits: int = 4) -> ModelParams:
    """Random big-geometry model with quantized weights, built DIRECTLY in
    the fused single-chip layout (wqkv / wgu) and fully-quantized embedding +
    untied head: running fuse_params on a 14B model would hold original and
    concatenated copies concurrently and bust HBM."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    ks = jax.random.split(key, 8)
    layers = dict(
        ln1=jnp.ones((L, D), jnp.float32),
        ln2=jnp.ones((L, D), jnp.float32),
        wqkv=_init_q(ks[0], D, (H + 2 * Hkv) * hd, L, bits),
        wo=_init_q(ks[1], H * hd, D, L, bits),
        wgu=_init_q(ks[2], D, 2 * F, L, bits),
        wdown=_init_q(ks[3], F, D, L, bits),
    )
    if cfg.attention_bias:
        layers["bqkv"] = jnp.zeros((L, (H + 2 * Hkv) * hd), cfg.dtype)
    k1, k2 = jax.random.split(ks[4])
    embed = QuantizedEmbedding(
        codes=jax.random.randint(k1, (cfg.vocab_size, D), -127, 128, jnp.int8),
        scale=jnp.full((cfg.vocab_size,), 2e-4, jnp.float32))
    head = jax.tree.map(lambda a: a[0], _init_q(k2, D, cfg.vocab_size, 1, bits))
    return ModelParams(embed=embed, layers=layers,
                       final_norm=jnp.ones((D,), jnp.float32), lm_head=head)


class CoupledEagleParams(NamedTuple):
    """Parameters of the coupled EAGLE target: the big trunk plus the shared
    bigram-oracle pieces (aliases of the head's arrays — no extra memory)."""
    big: ModelParams
    embed: jax.Array      # [V, D]   shared with EagleParams.embed
    fc_e: jax.Array       # [D, D]   emb half of the head's fc
    lm_head: jax.Array    # [D, V]   shared with EagleParams.lm_head
    scale: jax.Array      # f32 — sharpening of the oracle signal
    lam: jax.Array        # f32 — weight of the standardized big logits


def build_bigram_eagle_head(ecfg, key: jax.Array):
    """Construct an EAGLE-1 head (models/eagle.py version=1 geometry) that
    computes an EXACT bigram oracle while paying the full head compute.

    With fc = [A; 0] (feature half zeroed), fc_b = 0, wo = 0, wdown = 0 the
    v1 forward collapses to out = A @ emb[token] at EVERY absorb position and
    beam level (head_forward: out = fused + wo@att + wdown@mlp), and
    draft_logp applies lm_head directly, so

        head_logits(tok) = (emb[tok] @ A) @ lm_head  =: u(tok)

    — a pure function of the current token, exactly representable by the
    head architecture at all trie depths. Attention and MLP still run with
    random nonzero wq/wk/wv/wgate/wup, so the measured cost is the real v1
    head cost (zero OUTPUT projections change no matmul shapes). The coupled
    target (make_coupled_eagle_target) computes the same u(tok), so trie
    acceptance is a calibratable function of (scale, lam) — the EAGLE analog
    of the coupled GSM8K construction above.
    """
    import dataclasses as _dc

    from ..models.eagle import EagleParams, init_eagle_params_v1
    assert ecfg.version == 1, "bigram oracle construction is v1-exact only"
    p = init_eagle_params_v1(ecfg, key)
    D = ecfg.hidden_size
    kA = jax.random.fold_in(key, 101)
    A = (jax.random.normal(kA, (D, D), jnp.float32) * D ** -0.5
         ).astype(ecfg.dtype)
    fc = jnp.concatenate([A, jnp.zeros((D, D), ecfg.dtype)], axis=0)
    return p._replace(fc=fc,
                      fc_b=jnp.zeros((D,), ecfg.dtype),
                      wo=jnp.zeros_like(p.wo),
                      wdown=jnp.zeros_like(p.wdown))


def oracle_logits(cp: CoupledEagleParams, tokens: jax.Array) -> jax.Array:
    """u(tok) = (emb[tok] @ fc_e) @ lm_head — evaluated the same way the
    head evaluates it (two matmuls, same dtypes) so both sides see the same
    numerics."""
    emb = jnp.take(cp.embed, tokens, axis=0)
    return (emb @ cp.fc_e @ cp.lm_head).astype(jnp.float32)


def make_coupled_eagle_target(cfg_big: ModelConfig, feature_layers):
    """Coupled target forward for the EAGLE engine
    (`make_eagle_generate(target_forward=...)` signature):

        p_logits = scale * standardize(u(token)) + lam * standardize(big)

    Both signals are standardized per position (mean 0 / std 1 over the
    vocab), so `scale` and `lam` are in logit-std units and the head's
    top-k proposals stay EXACTLY aligned with the scale term (standardize
    is a monotone per-row affine map of u, so top-k(u) == top-k(z_u)).
    Every position pays the full big-geometry forward (plus one oracle
    lm_head application — the same extra matmul a real EAGLE target pays for
    its own head); features stream from the big trunk as usual (the head
    consumes them structurally but its constructed fc zeros them, see
    build_bigram_eagle_head)."""
    def _std(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        sd = jnp.std(x, axis=-1, keepdims=True) + 1e-6
        return (x - mu) / sd

    def forward(cp: CoupledEagleParams, tokens, cache, attn_bias, positions,
                lengths=None, staging_at=None):
        big_logits, cache, feats = transformer.forward(
            cfg_big, cp.big, tokens, cache, attn_bias=attn_bias,
            positions=positions, feature_layers=feature_layers,
            lengths=lengths, staging_at=staging_at)
        u = oracle_logits(cp, tokens)
        return cp.scale * _std(u) + cp.lam * _std(big_logits), cache, feats

    return forward


def build_coupled_eagle_pair(key: jax.Array, cfg_big: ModelConfig, ecfg,
                             scale: float = 4.0, lam: float = 0.0,
                             big_bits: int = 8, oov_scale: float = 0.5):
    """(head_params, CoupledEagleParams) for the EAGLE e2e benchmark at big
    geometry: int8 big trunk, v1 bigram-oracle head sharing embed/fc/lm_head
    arrays with the target's oracle.

    Reduced draft vocab (ecfg.draft_vocab_size < vocab_size, the EAGLE-3
    setting): the head ranks over the first Vd target ids (d2t == 0) and the
    target's oracle extends the same matrix with DOWN-WEIGHTED columns for
    the out-of-vocab ids (`oov_scale` < 1) — the target occasionally prefers
    a token the head cannot propose, modeling the real head's draft-vocab
    misses while keeping in-vocab rankings exactly aligned."""
    kb, ke = jax.random.split(key)
    head = build_bigram_eagle_head(ecfg, ke)
    big = init_quantized_params(cfg_big, kb, bits=big_bits)
    D = ecfg.hidden_size
    Vd, V = ecfg.draft_vocab_size, ecfg.vocab_size
    if Vd < V:
        rest = (jax.random.normal(jax.random.fold_in(key, 7), (D, V - Vd),
                                  jnp.float32) * D ** -0.5 * oov_scale
                ).astype(ecfg.dtype)
        lm_full = jnp.concatenate([head.lm_head, rest], axis=1)
    else:
        lm_full = head.lm_head
    # Sharpen the head's OWN distribution to ~the target's effective
    # sharpness (a trained head matches the target's entropy): scale lm_head
    # so the head's logit-std per row ~= `scale`. Without this the beam's
    # cumulative log-probs are flat and the global top-N cut keeps only
    # level-0/1 nodes — no deep paths, acceptance artificially capped (the
    # raw random-matrix u has logit-std ~0.05). Monotone per row, so the
    # head's top-k stays exactly aligned with the standardized target term.
    probe = jax.random.randint(jax.random.fold_in(key, 8), (128,), 0, V)
    u_probe = jnp.take(head.embed, probe, axis=0) @ head.fc[:D] @ lm_full
    sd = jnp.mean(jnp.std(u_probe.astype(jnp.float32), axis=-1))
    factor = (jnp.float32(scale) / jnp.maximum(sd, 1e-6)).astype(ecfg.dtype)
    head = head._replace(lm_head=head.lm_head * factor)
    lm_full = lm_full * factor
    target = CoupledEagleParams(
        big=big, embed=head.embed, fc_e=head.fc[:D], lm_head=lm_full,
        scale=jnp.float32(scale), lam=jnp.float32(lam))
    return head, target


def quantize_draft(cfg: ModelConfig, params: ModelParams,
                   bits: int = 8, quantize_head: bool = False) -> ModelParams:
    """GPTQ-style quantization of a (fused-layout) small model's matmul
    weights on device — the draft is the int8 image of the target's small
    trunk, so draft/target divergence is pure quantization error (the
    reference's own operating regime: both its models are GPTQ images of the
    same pretraining run's family).

    quantize_head=True additionally quantizes the embedding (per-row int8)
    and unties an int8 lm_head. MEASURED NEGATIVE at 0.5B geometry: the
    draft step went 1.74 -> 1.92 ms/token — V=151936 = 2^7 * 1187 (prime)
    forces the int8 kernel to 128-wide out-tiles (1187 grid steps), losing
    more than the halved bytes save. Default stays bf16-tied; the knob
    remains for vocab sizes with friendlier factorizations."""
    L = dict(params.layers)
    for name in ("wqkv", "wo", "wgu", "wdown", "wq", "wk", "wv",
                 "wgate", "wup"):
        if name in L and not isinstance(L[name], QuantizedLinear):
            gs = _gs(L[name].shape[-2])
            L[name] = jax.vmap(
                lambda w: quantize(w, bits=bits, group_size=gs))(L[name])
    out = params._replace(layers=L)
    if quantize_head and not isinstance(params.embed, QuantizedEmbedding):
        from ..models.transformer import quantize_embedding
        head_dense = (params.embed.T if params.lm_head is None
                      else params.lm_head)
        D = head_dense.shape[0]
        out = out._replace(
            embed=quantize_embedding(params.embed),
            lm_head=quantize(head_dense.astype(jnp.float32), bits=8,
                             group_size=_gs(D)))
    return out


def build_coupled_pair(key: jax.Array, cfg_small: ModelConfig,
                       cfg_big: ModelConfig, lam: float,
                       logit_scale: float = 1.65, big_bits: int = 4
                       ) -> Tuple[ModelParams, CoupledParams]:
    """Build (draft_params, target_params) for the coupled benchmark.

    logit_scale sharpens the small trunk's logits (synthetic-random weights
    produce too-flat distributions otherwise); lam sets the extra target-only
    divergence. Both knobs are calibrated so block efficiency lands in the
    reference's published band (docs/BENCHMARKS.md)."""
    kb, ks = jax.random.split(key)
    small = transformer.init_params(cfg_small, ks)
    small = small._replace(
        embed=(small.embed.astype(jnp.float32) * logit_scale
               ).astype(cfg_small.dtype))
    small = fuse_params(cfg_small, small)
    draft = quantize_draft(cfg_small, small, bits=8)
    big = init_quantized_params(cfg_big, kb, bits=big_bits)
    target = CoupledParams(big=big, small=small,
                           lam=jnp.float32(lam))
    return draft, target
