"""Speculative decode orchestration — the TPU-native counterpart of the
reference's `_assisted_decoding` loop (`transformers/generation/utils.py:
4555-5179`) and the draft-side `_sample` multigen loop (:3270-3480).

Design (SURVEY.md §7): the whole generate runs ON DEVICE as a
`lax.while_loop` over speculative blocks; each block is

    draft (lax.scan of gamma single-token steps over K parallel draft rows)
    -> one target forward over gamma+1 positions (all K rows batched)
    -> vectorized verification kernel
    -> commit + O(1) KV rollback (+ multidraft row-select)

with exactly one host sync per generate call, not per block. All shapes are
static: prompts are left-padded into buckets, gamma and K are config.

Telemetry: per-block accepted counts / rounds are recorded into fixed-size
arrays — the counterpart of the reference's `counts` dict (utils.py:4644-4647)
used for block-efficiency stats.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..ops.sampling import process_logits, processor, sample
from ..verify import verify
from .kvcache import KVCache, init_cache, rollback, select_draft_row


class GenerateResult(NamedTuple):
    tokens: jax.Array        # [S_max] committed tokens incl. (padded) prompt
    length: jax.Array        # int32 total committed length (incl. prompt pad)
    prompt_len: jax.Array    # int32 bucket length of the prompt region
    blocks: jax.Array        # int32 number of speculative blocks executed
    accepts: jax.Array       # [max_blocks] int32 n_matches per block (-1 unused)
    draft_lens: jax.Array    # [max_blocks] int32 drafted gamma per block
    ncommit: jax.Array       # int32 committed new tokens
    # optional acceptance telemetry (the reference's return_probs channel,
    # utils.py:5583): zeros unless EngineConfig/collect_telemetry
    step_back_probs: jax.Array = jnp.zeros(())  # [max_blocks, K, gamma] f32
    p_i: jax.Array = jnp.zeros(())              # [max_blocks, gamma] f32
    q_i: jax.Array = jnp.zeros(())              # [max_blocks, gamma] f32
    # [max_blocks] int32 inner rounds per block (-1 unused): the recursive /
    # forward-sampling engines' hist_lengths analog (ref counts channel,
    # utils.py:4644-4647); single-pass engines leave it at the default
    rounds: jax.Array = jnp.zeros(())


def _draft_block(cfg: ModelConfig, params, cache: KVCache, last2, last1,
                 key, gamma: int, temperature: float):
    """Draft gamma tokens for each of the K cache rows (K parallel drafts,
    ref `_sample` with multigen/parallel, utils.py:3359-3364).

    last2/last1: int32 scalars — the two newest committed tokens. The draft
    cache is kept at committed_length - 2 between blocks, because after a
    fully-accepted block the final draft token's KV was never computed by the
    draft model; the first draft step therefore (re)feeds two tokens —
    idempotent when the first slot was already populated. (The reference
    handles this by re-running the draft on the whole uncached suffix inside
    `get_candidates`.)

    `temperature` may be a float or a prepared processor closure
    (ops.sampling.processor) carrying top_k/top_p.

    Returns (draft_tokens [K, gamma], q [K, gamma, V], cache advanced).
    """
    proc = temperature if callable(temperature) else processor(temperature)
    K = cache.batch
    keys = jax.random.split(key, gamma)

    tok01 = jnp.stack([jnp.broadcast_to(last2, (K,)),
                       jnp.broadcast_to(last1, (K,))], axis=1).astype(jnp.int32)
    logits0, cache = transformer.forward(cfg, params, tok01, cache)
    probs0 = proc(logits0[:, 1])                                 # [K, V]
    x0 = sample(keys[0], probs0).astype(jnp.int32)               # [K]

    def step(carry, k):
        cache, tok = carry
        logits, cache = transformer.forward(cfg, params, tok[:, None], cache)
        probs = proc(logits[:, 0])                               # [K, V]
        nxt = sample(k, probs).astype(jnp.int32)                 # [K]
        return (cache, nxt), (nxt, probs)

    (cache, _), (toks, qs) = jax.lax.scan(step, (cache, x0), keys[1:])
    draft_toks = jnp.concatenate([x0[:, None], toks.T], axis=1)  # [K, gamma]
    q = jnp.concatenate([probs0[:, None], jnp.swapaxes(qs, 0, 1)], axis=1)
    return draft_toks, q, cache


def _draft_block_striped(cfg: ModelConfig, params, cache: KVCache, last2,
                         last1, key, gamma: int, num_drafts: int,
                         temperature: float):
    """Striped-tree drafting (ref `_sample` parallel=False, utils.py:3369-3378):
    rows = [primary] + gamma groups of (K-1) branch rows; group j mirrors the
    primary through position j-1, samples its own alternative at position j,
    then continues its own path. Mirroring = overriding not-yet-activated
    rows' samples with the primary's, which keeps their KV bitwise identical
    to row 0's without any copying."""
    proc = temperature if callable(temperature) else processor(temperature)
    R = cache.batch
    K = num_drafts
    # activation step of each row: row 0 -> 0 (always its own), row
    # 1 + j*(K-1) + c -> j
    act = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.repeat(jnp.arange(gamma, dtype=jnp.int32), K - 1)])
    keys = jax.random.split(key, gamma)

    tok01 = jnp.stack([jnp.broadcast_to(last2, (R,)),
                       jnp.broadcast_to(last1, (R,))], axis=1).astype(jnp.int32)
    logits0, cache = transformer.forward(cfg, params, tok01, cache)
    probs0 = proc(logits0[:, 1])                                 # [R, V]
    s0 = jax.vmap(lambda k, pr: sample(k, pr))(
        jax.random.split(keys[0], R), probs0).astype(jnp.int32)
    x0 = jnp.where(act > 0, s0[0], s0)

    def step(carry, inp):
        cache, tok = carry
        j, k = inp
        logits, cache = transformer.forward(cfg, params, tok[:, None], cache)
        probs = proc(logits[:, 0])                               # [R, V]
        s = jax.vmap(lambda kk, pr: sample(kk, pr))(
            jax.random.split(k, R), probs).astype(jnp.int32)
        nxt = jnp.where(act > j, s[0], s)
        return (cache, nxt), (nxt, probs)

    (cache, _), (toks, qs) = jax.lax.scan(
        step, (cache, x0), (jnp.arange(1, gamma), keys[1:]))
    draft_toks = jnp.concatenate([x0[:, None], toks.T], axis=1)  # [R, gamma]
    q = jnp.concatenate([probs0[:, None], jnp.swapaxes(qs, 0, 1)], axis=1)
    return draft_toks, q, cache


def make_generate(cfg_draft: ModelConfig, cfg_target: ModelConfig,
                  engine: EngineConfig, collect_telemetry: bool = False,
                  target_forward=None, target_cache_ops=None):
    """Build a jitted speculative
    `generate(params_draft, params_target, prompt, prompt_len, key)`.

    prompt: [P_bucket] int32, LEFT-padded to a static bucket length.
    prompt_len: int32 — actual prompt token count (pad = P_bucket - len).
    Returns GenerateResult (device arrays; one host sync to read them).
    collect_telemetry: also record per-block step_back_probs / p_i / q_i
    (the reference's return_probs channel).
    target_forward: optional `(params, tokens, cache) -> (logits, cache)`
    override for the target model — e.g. `parallel.tp.make_tp_target_forward`
    to run the target on local Megatron shards (Pallas kernels) inside one
    shard_map while the rest of the loop stays GSPMD.
    target_cache_ops: optional `(init, rollback, select)` triple overriding
    the target-side cache protocol, for targets whose state is not a single
    KVCache (e.g. the coupled synthetic target in eval/synthetic.py, or a
    future sliding-window cache). Signatures:
        init(batch, max_len, start) -> cache
        rollback(cache, new_length) -> cache       (O(1) truncate)
        select(cache, row) -> cache                (multidraft row-select)
    """
    v = engine.verifier
    gamma, K = v.gamma, v.num_drafts
    striped = (not v.parallel) and K > 1
    R = 1 + gamma * (K - 1) if striped else K   # draft batch rows
    method = v.method
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    max_blocks = max_new  # each block commits >= 1 token
    eos = cfg_target.eos_token_id
    tfwd = target_forward or (lambda p, t, c: transformer.forward(
        cfg_target, p, t, c))
    if target_cache_ops is None:
        t_init = lambda batch, max_len, start: init_cache(
            cfg_target, batch, max_len)._replace(start=start)
        t_rollback, t_select = rollback, select_draft_row
    else:
        t_init, t_rollback, t_select = target_cache_ops

    def generate(params_draft, params_target, prompt: jax.Array,
                 prompt_len: jax.Array, key: jax.Array) -> GenerateResult:
        P = prompt.shape[0]
        S = P + max_new + gamma + 2
        start = jnp.broadcast_to(P - prompt_len, (R,)).astype(jnp.int32)
        dcache = init_cache(cfg_draft, R, S)._replace(start=start)
        tcache = t_init(R, S, start)

        # --- prefill ---------------------------------------------------
        # Cache invariants between blocks: target holds committed-1 positions
        # (the newest token is re-fed each block, mirroring the reference's
        # crop-to-new_cur_len-1 bookkeeping, utils.py:5026); draft holds
        # committed-2 (see _draft_block).
        prompt_k = jnp.broadcast_to(prompt[None, :], (R, P))
        _, dcache = transformer.forward(cfg_draft, params_draft,
                                        prompt_k[:, :-2], dcache)
        _, tcache = tfwd(params_target, prompt_k[:, :-1], tcache)

        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
        accepts = jnp.full((max_blocks,), -1, jnp.int32)
        dlens = jnp.full((max_blocks,), -1, jnp.int32)
        tel0 = (jnp.zeros((max_blocks, K, gamma), jnp.float32),) * 3 \
            if collect_telemetry else (jnp.zeros(()),) * 3

        def cond(state):
            (_, length, done, _, _, _, _, _, _, blocks) = state
            return (~done) & (length + gamma + 1 <= S) & (blocks < max_blocks) \
                & (length - P < max_new)

        def body(state):
            (tokens, length, done, dcache, tcache, key, accepts, dlens, tel,
             blocks) = state
            key, kd, kv = jax.random.split(key, 3)
            last = tokens[length - 1]

            # draft R rows of gamma tokens
            if striped:
                draft_toks, q, dcache = _draft_block_striped(
                    cfg_draft, params_draft, dcache, tokens[length - 2], last,
                    kd, gamma, K, temp)
            else:
                draft_toks, q, dcache = _draft_block(
                    cfg_draft, params_draft, dcache, tokens[length - 2], last,
                    kd, gamma, temp)

            # one target forward over [last] + draft for all R rows
            tgt_in = jnp.concatenate(
                [jnp.broadcast_to(last, (R, 1)).astype(jnp.int32), draft_toks],
                axis=1)                                        # [R, gamma+1]
            tlogits, tcache = tfwd(params_target, tgt_in, tcache)
            p = temp(tlogits)                                  # [R, gamma+1, V]

            if collect_telemetry and method in ("tokenwise", "hsd", "hsd_ref"):
                res, tm = verify(method, kv, draft_toks, q, p, num_drafts=K,
                                 striped=striped, return_telemetry=True)
                tel = tuple(t.at[blocks].set(v) for t, v in
                            zip(tel, (tm.step_back_probs, tm.p_i, tm.q_i)))
            else:
                res = verify(method, kv, draft_toks, q, p, num_drafts=K,
                             striped=striped)
            n_commit = res.n_matches + 1

            # commit tokens
            posn = jnp.arange(tokens.shape[0])
            src = jnp.take(res.tokens, jnp.clip(posn - length, 0, gamma), axis=0)
            write = (posn >= length) & (posn < length + n_commit)
            tokens = jnp.where(write, src, tokens)
            new_length = length + n_commit

            # EOS: done when any newly committed token is EOS
            hit_eos = jnp.any(write & (tokens == eos))
            done = done | hit_eos

            # KV rollback: target holds new_length-1 positions, draft
            # new_length-2 (see _draft_block); select the winning draft row
            # for multidraft
            dcache = rollback(dcache, new_length - 2)
            tcache = t_rollback(tcache, new_length - 1)
            if R > 1:
                dcache = select_draft_row(dcache, res.draft_index)
                tcache = t_select(tcache, res.draft_index)

            accepts = accepts.at[blocks].set(res.n_matches)
            dlens = dlens.at[blocks].set(gamma)
            return (tokens, new_length, done, dcache, tcache, key, accepts,
                    dlens, tel, blocks + 1)

        state = (tokens, jnp.int32(P), jnp.bool_(False), dcache, tcache, key,
                 accepts, dlens, tel0, jnp.int32(0))
        (tokens, length, done, _, _, _, accepts, dlens, tel, blocks) = \
            jax.lax.while_loop(cond, body, state)

        # clamp to the token budget (a full block can overshoot by <= gamma),
        # then truncate at the first EOS in the generated region
        length = jnp.minimum(length, P + max_new)
        gen_pos = jnp.arange(tokens.shape[0])
        is_eos = (tokens == eos) & (gen_pos >= P) & (gen_pos < length)
        first_eos = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), length)
        length = jnp.minimum(length, first_eos + 1)

        return GenerateResult(tokens=tokens, length=length,
                              prompt_len=jnp.int32(P), blocks=blocks,
                              accepts=accepts, draft_lens=dlens,
                              ncommit=length - P,
                              step_back_probs=tel[0], p_i=tel[1], q_i=tel[2])

    return jax.jit(generate)


def make_generate_batched(cfg_draft: ModelConfig, cfg_target: ModelConfig,
                          engine: EngineConfig):
    """Vmapped multi-request speculative generate: prompts [B, P] (same
    bucket), prompt_lens [B], keys [B] -> batched GenerateResult. Requests run
    in lockstep on device (each finishes independently via its own `done`
    flag; the batch returns when all are done). The first step toward
    request-level continuous batching; combine with the `data` mesh axis to
    spread requests across chips."""
    gen = make_generate(cfg_draft, cfg_target, engine)
    return jax.jit(jax.vmap(gen, in_axes=(None, None, 0, 0, 0)))


def make_autoregressive(cfg: ModelConfig, engine: EngineConfig,
                        model_forward=None, cache_init=None):
    """Plain AR sampling baseline (the reference's `_sample` /
    `naivegenerate`, ea_model.py:368-462) — the decoding-speed denominator.

    model_forward / cache_init: same override protocol as make_generate's
    target_forward / target_cache_ops[0], so the AR denominator can run the
    exact same (possibly composite) target as the speculative path."""
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg.eos_token_id
    fwd = model_forward or (lambda p, t, c: transformer.forward(cfg, p, t, c))
    cinit = cache_init or (lambda batch, max_len, start: init_cache(
        cfg, batch, max_len)._replace(start=start))

    def generate(params, prompt: jax.Array, prompt_len: jax.Array,
                 key: jax.Array):
        P = prompt.shape[0]
        S = P + max_new + 1
        cache = cinit(
            1, S, jnp.broadcast_to(P - prompt_len, (1,)).astype(jnp.int32))
        _, cache = fwd(params, prompt[None, :-1], cache)
        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)

        def cond(state):
            tokens, length, done, cache, key = state
            return (~done) & (length - P < max_new)

        def body(state):
            tokens, length, done, cache, key = state
            key, ks = jax.random.split(key)
            logits, cache = fwd(params, tokens[length - 1][None, None], cache)
            probs = temp(logits[0, 0])
            nxt = sample(ks, probs).astype(jnp.int32)
            tokens = tokens.at[length].set(nxt)
            return (tokens, length + 1, done | (nxt == eos), cache, key)

        state = (tokens, jnp.int32(P), jnp.bool_(False), cache, key)
        tokens, length, _, _, _ = jax.lax.while_loop(cond, body, state)
        return tokens, length

    return jax.jit(generate)
