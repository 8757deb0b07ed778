"""Stepwise (non-clever) HSD decoding: backward block + forward-sampling
inner steps.

The reference's non-clever mode (`backward=True, clever=False`) follows each
speculative block with an INNER loop that drafts ONE token per step and
verifies it against the joint residual at the frontier
(`_assisted_decoding` inner loop, utils.py:4666-4717/5052-5074, and
`_forward_sampling`, :5182-5240): every inner step commits the token
resampled from the frontier's joint divergence; the drafted proposal only
survives when the resample lands on it, and a bonus token is drawn when the
block's budget is reached on an accepted proposal.

The committed reference's engine wiring for this mode is partially broken
(SURVEY.md §0: the `recursive` call signature mismatch; `first_step`
bookkeeping tangles), so this implementation follows the paper-level
structure faithfully rather than bug-for-bug: outer block = the committed
backward verifier (`hsd_ref`), inner steps = forward_sampling_step over the
block's accumulated (token, q, p) rows. The clever (capped) single-pass mode
remains the benchmarked default — this mode exists for capability parity and
research.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..ops.sampling import process_logits, processor, sample
from ..verify import verify
from ..verify.forward_sampling import forward_sampling_step
from ..verify.recursive import recursive_round
from .kvcache import init_cache, rollback
from .speculative import GenerateResult, _draft_block


def _draft_tail(cfg: ModelConfig, params, cache, last2, last1, key, L,
                gamma: int, temp):
    """Draft a DYNAMIC number of tokens L (1 <= L <= gamma, data-dependent)
    on a batch-1 cache, continuing the committed trajectory.

    Recursive inner rounds re-draft only the remaining block budget
    (ref utils.py:4678: `num_assistant_tokens = candidate_length -
    (new_cur_len - cur_len)`), so unlike `_draft_block` (static gamma via
    lax.scan) this runs a bounded `lax.while_loop` — same model-call count
    as the reference. Cache convention as in `_draft_block`: enters at
    committed-2 and re-feeds the two newest committed tokens.

    Returns (tokens [gamma], q [gamma, V], cache) with the first L rows valid.
    """
    proc = temp if callable(temp) else processor(temp)
    tok01 = jnp.stack([last2, last1])[None, :].astype(jnp.int32)
    logits0, cache = transformer.forward(cfg, params, tok01, cache)
    probs0 = proc(logits0[:, 1])                                  # [1, V]
    x0 = sample(jax.random.fold_in(key, 0), probs0).astype(jnp.int32)
    V = probs0.shape[-1]
    toks = jnp.zeros((gamma,), jnp.int32).at[0].set(x0[0])
    qs = jnp.zeros((gamma, V), jnp.float32).at[0].set(probs0[0])

    def cond(st):
        return st[0] < L

    def body(st):
        j, cache, toks, qs, prev = st
        logits, cache = transformer.forward(cfg, params, prev[None, :], cache)
        probs = proc(logits[:, 0])
        nxt = sample(jax.random.fold_in(key, j), probs).astype(jnp.int32)
        return (j + 1, cache, toks.at[j].set(nxt[0]), qs.at[j].set(probs[0]),
                nxt)

    _, cache, toks, qs, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), cache, toks, qs, x0))
    return toks, qs, cache


def make_stepwise_generate(cfg_draft: ModelConfig, cfg_target: ModelConfig,
                           engine: EngineConfig):
    """Jitted stepwise-HSD generate (K=1). Same signature as make_generate."""
    gamma = engine.verifier.gamma
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg_target.eos_token_id
    max_blocks = max_new

    def generate(params_draft, params_target, prompt, prompt_len, key):
        P = prompt.shape[0]
        S = P + max_new + gamma + 2
        V = cfg_target.vocab_size
        start = jnp.broadcast_to(P - prompt_len, (1,)).astype(jnp.int32)
        dcache = init_cache(cfg_draft, 1, S)._replace(start=start)
        tcache = init_cache(cfg_target, 1, S)._replace(start=start)
        pk = prompt[None, :]
        _, dcache = transformer.forward(cfg_draft, params_draft, pk[:, :-2],
                                        dcache)
        _, tcache = transformer.forward(cfg_target, params_target, pk[:, :-1],
                                        tcache)
        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
        accepts = jnp.full((max_blocks,), -1, jnp.int32)
        dlens = jnp.full((max_blocks,), -1, jnp.int32)

        def commit_one(tokens, length, tok):
            tokens = tokens.at[jnp.clip(length, 0, S - 1)].set(tok)
            return tokens, length + 1

        def inner_cond(st):
            (_, _, done_i, _, _, _, _, block_commits, _, _, _, _) = st
            return (~done_i) & (block_commits < gamma)

        def inner_body(st):
            (tokens, length, done_i, dcache, tcache, key, cand_len,
             block_commits, cand, qbuf, pbuf, ncommit_acc) = st
            key, kd, kf = jax.random.split(key, 3)
            # 1-token draft proposal (cache-invariant absorb of last two)
            dcache_r = rollback(dcache, length - 2)
            prop, qrow, dcache2 = _draft_block(
                cfg_draft, params_draft, dcache_r, tokens[length - 2],
                tokens[length - 1], kd, 1, temp)
            x_new = prop[0, 0]
            # target row for the next position
            tcache_r = rollback(tcache, length - 1)
            tlog, tcache2 = transformer.forward(
                cfg_target, params_target, tokens[length - 1][None, None],
                tcache_r)
            prow = temp(tlog[0, 0])

            cand2 = cand.at[cand_len].set(x_new)
            qbuf2 = qbuf.at[cand_len].set(qrow[0, 0])
            pbuf2 = pbuf.at[cand_len].set(prow)
            last_step = block_commits + 1 >= gamma
            toks2, n2 = forward_sampling_step(kf, cand2, qbuf2, pbuf2,
                                              cand_len + 1,
                                              last_step=last_step)
            t = toks2[0]
            accepted = t == x_new
            tokens, length = commit_one(tokens, length, t)
            # NOTE: the reference draws a bonus token from the next target row
            # when the final proposal is accepted (:5229-5236); incrementally
            # that row has not been evaluated yet, and skipping the bonus is
            # distributionally neutral (the next block samples the same
            # conditional) at the cost of one fewer token per fully-accepted
            # stepwise block.
            del n2
            # proposal rejected -> the candidate trajectory diverged; keep
            # the committed token in the buffers (the reference re-evaluates
            # q/p along committed tokens, utils.py:5326-5330)
            cand2 = cand2.at[cand_len].set(t)
            done_i = (~accepted) | (t == eos)
            return (tokens, length, done_i, dcache2, tcache2, key,
                    cand_len + 1, block_commits + 1, cand2, qbuf2, pbuf2,
                    ncommit_acc + 1)

        def cond(state):
            (_, length, done, _, _, _, _, _, _, blocks) = state
            return (~done) & (length + gamma + 2 <= S) & \
                (blocks < max_blocks) & (length - P < max_new)

        def body(state):
            (tokens, length, done, dcache, tcache, key, accepts, dlens,
             rnds, blocks) = state
            key, kd, kv, ki = jax.random.split(key, 4)
            # ---- outer backward block (committed-reference verifier)
            draft_toks, q, dcache = _draft_block(
                cfg_draft, params_draft, dcache, tokens[length - 2],
                tokens[length - 1], kd, gamma, temp)
            tgt_in = jnp.concatenate(
                [tokens[length - 1][None, None], draft_toks], axis=1)
            tlogits, tcache = transformer.forward(cfg_target, params_target,
                                                  tgt_in, tcache)
            p = temp(tlogits)
            res = verify("hsd_ref", kv, draft_toks, q, p)
            n_commit = res.n_matches + 1
            posn = jnp.arange(S)
            src = jnp.take(res.tokens, jnp.clip(posn - length, 0, gamma))
            write = (posn >= length) & (posn < length + n_commit)
            tokens = jnp.where(write, src, tokens)
            new_length = length + n_commit
            dcache = rollback(dcache, new_length - 2)
            tcache = rollback(tcache, new_length - 1)
            hit_eos = jnp.any(write & (tokens == eos))

            # ---- forward-sampling inner steps until the block budget
            V_ = p.shape[-1]
            inner0 = (tokens, new_length, hit_eos | (res.n_matches >= gamma),
                      dcache, tcache, ki, jnp.int32(0),
                      res.n_matches + 1, jnp.zeros((gamma,), jnp.int32),
                      jnp.zeros((gamma, V_), jnp.float32),
                      jnp.zeros((gamma, V_), jnp.float32), jnp.int32(0))
            (tokens, new_length, _, dcache, tcache, _, _, _, _, _, _,
             n_inner) = jax.lax.while_loop(inner_cond, inner_body, inner0)

            dcache = rollback(dcache, new_length - 2)
            tcache = rollback(tcache, new_length - 1)
            gen_pos = jnp.arange(S)
            done = done | jnp.any((tokens == eos) & (gen_pos >= P)
                                  & (gen_pos < new_length))
            accepts = accepts.at[blocks].set(res.n_matches)
            dlens = dlens.at[blocks].set(gamma)
            # hist_lengths analog: forward-sampling inner steps this block
            rnds = rnds.at[blocks].set(n_inner)
            return (tokens, new_length, done, dcache, tcache, key, accepts,
                    dlens, rnds, blocks + 1)

        state = (tokens, jnp.int32(P), jnp.bool_(False), dcache, tcache, key,
                 accepts, dlens, jnp.full((max_blocks,), -1, jnp.int32),
                 jnp.int32(0))
        (tokens, length, done, _, _, _, accepts, dlens, rnds, blocks) = \
            jax.lax.while_loop(cond, body, state)
        length = jnp.minimum(length, P + max_new)
        gen_pos = jnp.arange(S)
        is_eos = (tokens == eos) & (gen_pos >= P) & (gen_pos < length)
        first_eos = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), length)
        length = jnp.minimum(length, first_eos + 1)
        return GenerateResult(tokens=tokens, length=length,
                              prompt_len=jnp.int32(P), blocks=blocks,
                              accepts=accepts, draft_lens=dlens,
                              ncommit=length - P, rounds=rnds)

    return jax.jit(generate)


def make_recursive_generate(cfg_draft: ModelConfig, cfg_target: ModelConfig,
                            engine: EngineConfig):
    """Jitted recursive-HSD generate (the reference's `recursive=True` mode,
    repaired — see verify/recursive.py). Same signature as make_generate.

    Block structure (ref _assisted_decoding inner loop, utils.py:4666-4717
    with `recursive`): round 0 drafts the full gamma budget and runs one raw
    backward verification; every later round re-drafts the REMAINING budget
    onto the accumulated trajectory and re-verifies it with joints seeded
    from the block start, until gamma tokens are committed or EOS.
    """
    gamma = engine.verifier.gamma
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg_target.eos_token_id
    max_blocks = max_new

    def generate(params_draft, params_target, prompt, prompt_len, key):
        P = prompt.shape[0]
        S = P + max_new + gamma + 2
        V = cfg_target.vocab_size
        start = jnp.broadcast_to(P - prompt_len, (1,)).astype(jnp.int32)
        dcache = init_cache(cfg_draft, 1, S)._replace(start=start)
        tcache = init_cache(cfg_target, 1, S)._replace(start=start)
        pk = prompt[None, :]
        _, dcache = transformer.forward(cfg_draft, params_draft, pk[:, :-2],
                                        dcache)
        _, tcache = transformer.forward(cfg_target, params_target, pk[:, :-1],
                                        tcache)
        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
        accepts = jnp.full((max_blocks,), -1, jnp.int32)
        dlens = jnp.full((max_blocks,), -1, jnp.int32)

        def inner_cond(st):
            (_, _, done_i, _, _, _, hist, _, _, _, _, _, _) = st
            return (~done_i) & (hist < gamma)

        def inner_body(st):
            (tokens, length, done_i, dcache, tcache, key, hist, cand, qbuf,
             pbuf, acc_drafted, drafted_acc, nrounds) = st
            key, kd, kv = jax.random.split(key, 3)
            L = gamma - hist
            # re-draft the remaining budget onto the committed trajectory
            dcache_r = rollback(dcache, length - 2)
            tail_toks, tail_q, dcache2 = _draft_tail(
                cfg_draft, params_draft, dcache_r, tokens[length - 2],
                tokens[length - 1], kd, L, gamma, temp)
            # one target forward over the tail (+ bonus row); positions past
            # L carry junk that is causal-masked away and rolled back
            tcache_r = rollback(tcache, length - 1)
            tgt_in = jnp.concatenate([tokens[length - 1][None], tail_toks]
                                     )[None, :]                  # [1, gamma+1]
            tlogits, tcache2 = transformer.forward(cfg_target, params_target,
                                                   tgt_in, tcache_r)
            p_fwd = temp(tlogits[0])                             # [gamma+1, V]
            # scatter the tail into the block trajectory buffers at hist+j
            pos = jnp.arange(gamma)
            j = jnp.clip(pos - hist, 0, gamma - 1)
            cand2 = jnp.where(pos >= hist, tail_toks[j], cand)
            qbuf2 = jnp.where((pos >= hist)[:, None], tail_q[j], qbuf)
            pos1 = jnp.arange(gamma + 1)
            j1 = jnp.clip(pos1 - hist, 0, gamma)
            pbuf2 = jnp.where((pos1 >= hist)[:, None], p_fwd[j1], pbuf)

            out, n_commit, full, resid = recursive_round(
                kv, cand2, qbuf2, pbuf2, hist, jnp.int32(gamma))
            posn = jnp.arange(S)
            src = jnp.take(out, jnp.clip(posn - length, 0, gamma))
            write = (posn >= length) & (posn < length + n_commit)
            tokens = jnp.where(write, src, tokens)
            length2 = length + n_commit
            # record the resampled token in the trajectory (its q row at
            # that position is already in the buffer)
            res_pos = jnp.clip(hist + n_commit - 1, 0, gamma - 1)
            t_last = out[jnp.clip(n_commit - 1, 0, gamma)]
            cand3 = jnp.where(full, cand2, cand2.at[res_pos].set(t_last))
            # the recursion's p-row substitution ("treat p_prime as p_i",
            # ref utils.py:5259-5277): the next round verifies the committed
            # history against THIS round's residual measure, so overwrite the
            # history p-rows [0, hist + n_commit) with the normalized
            # residuals. q rows stay ("q_i stays the same").
            hist2 = hist + n_commit
            pbuf3 = jnp.where((jnp.arange(gamma + 1) < hist2)[:, None],
                              jnp.concatenate([resid,
                                               pbuf2[-1:]], axis=0), pbuf2)
            hit_eos = jnp.any(write & (tokens == eos))
            dcache3 = rollback(dcache2, length2 - 2)
            tcache3 = rollback(tcache2, length2 - 1)
            return (tokens, length2, hit_eos | full, dcache3, tcache3, key,
                    hist2, cand3, qbuf2, pbuf3,
                    acc_drafted + n_commit - 1, drafted_acc + L, nrounds + 1)

        def cond(state):
            (_, length, done, _, _, _, _, _, _, blocks) = state
            return (~done) & (length + gamma + 2 <= S) & \
                (blocks < max_blocks) & (length - P < max_new)

        def body(state):
            (tokens, length, done, dcache, tcache, key, accepts, dlens,
             rnds, blocks) = state
            key, ki = jax.random.split(key)
            inner0 = (tokens, length, jnp.bool_(False), dcache, tcache, ki,
                      jnp.int32(0), jnp.zeros((gamma,), jnp.int32),
                      jnp.zeros((gamma, V), jnp.float32),
                      jnp.zeros((gamma + 1, V), jnp.float32), jnp.int32(0),
                      jnp.int32(0), jnp.int32(0))
            (tokens, new_length, _, dcache, tcache, _, _, _, _, _,
             acc_drafted, drafted_acc, nrounds) = jax.lax.while_loop(
                 inner_cond, inner_body, inner0)
            gen_pos = jnp.arange(S)
            done = done | jnp.any((tokens == eos) & (gen_pos >= P)
                                  & (gen_pos < new_length))
            accepts = accepts.at[blocks].set(acc_drafted)
            # real drafted count: a multi-round block drafts
            # sum_r (gamma - hist_r) >= gamma tokens, so acceptance-rate
            # telemetry (accepts / draft_lens) uses the true denominator
            dlens = dlens.at[blocks].set(drafted_acc)
            # hist_lengths analog (ref counts, utils.py:4644-4647): how many
            # inner re-draft rounds this block took
            rnds = rnds.at[blocks].set(nrounds)
            return (tokens, new_length, done, dcache, tcache, key, accepts,
                    dlens, rnds, blocks + 1)

        state = (tokens, jnp.int32(P), jnp.bool_(False), dcache, tcache, key,
                 accepts, dlens, jnp.full((max_blocks,), -1, jnp.int32),
                 jnp.int32(0))
        (tokens, length, done, _, _, _, accepts, dlens, rnds, blocks) = \
            jax.lax.while_loop(cond, body, state)
        length = jnp.minimum(length, P + max_new)
        gen_pos = jnp.arange(S)
        is_eos = (tokens == eos) & (gen_pos >= P) & (gen_pos < length)
        first_eos = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), length)
        length = jnp.minimum(length, first_eos + 1)
        return GenerateResult(tokens=tokens, length=length,
                              prompt_len=jnp.int32(P), blocks=blocks,
                              accepts=accepts, draft_lens=dlens,
                              ncommit=length - P, rounds=rnds)

    return jax.jit(generate)
