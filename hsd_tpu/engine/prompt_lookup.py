"""Prompt-lookup (n-gram) drafting — draft-model-free speculation.

Capability parity with the reference's `PromptLookupCandidateGenerator`
(transformers/generation/candidate_generator.py:304-710, upstream HF code the
harness uses when draft/target tokenizers differ, SURVEY.md §2.1 T8): the
candidate continuation is looked up from the generated context itself — find
the most recent earlier occurrence of the current max_ngram suffix and
propose the tokens that followed it.

TPU-native formulation: the scan over candidate positions is a vectorized
match over the whole context window (fixed shapes, jit-safe), not a Python
loop; proposals have q == one-hot so any verifier accepts with p(x)/1.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def propose_ngram(tokens: jax.Array, length: jax.Array, gamma: int,
                  max_ngram: int = 3) -> Tuple[jax.Array, jax.Array]:
    """Find a continuation candidate in `tokens[:length]`.

    Returns (draft [gamma] int32, n_found int32): the tokens that followed the
    most recent earlier occurrence of the longest matching suffix n-gram
    (n = max_ngram down to 1); n_found = 0 when nothing matches.
    """
    S = tokens.shape[0]
    pos = jnp.arange(S)

    best_draft = jnp.zeros((gamma,), jnp.int32)
    best_n = jnp.int32(0)
    found = jnp.bool_(False)

    for n in range(max_ngram, 0, -1):
        # suffix n-gram = tokens[length-n : length]
        suffix = jnp.take(tokens, jnp.clip(length - n + jnp.arange(n), 0, S - 1))
        # candidate start positions i: tokens[i : i+n] == suffix, with
        # i + n <= length - n (strictly earlier) — take the LATEST such i
        def match_at(i):
            win = jnp.take(tokens, jnp.clip(i + jnp.arange(n), 0, S - 1))
            return jnp.all(win == suffix)

        ok = jax.vmap(match_at)(pos) & (pos + n <= length - n) & (pos >= 0)
        has = jnp.any(ok)
        latest = jnp.where(ok, pos, -1).max()
        cont_start = latest + n
        avail = jnp.clip(length - cont_start, 0, gamma)
        draft = jnp.take(tokens, jnp.clip(cont_start + jnp.arange(gamma),
                                          0, S - 1))
        use = has & (avail > 0) & (~found)
        best_draft = jnp.where(use, draft, best_draft)
        best_n = jnp.where(use, avail, best_n)
        found = found | use
    return best_draft.astype(jnp.int32), best_n


def make_prompt_lookup_generate(cfg_target, engine, max_ngram: int = 3):
    """Speculative decoding with prompt-lookup drafting: one target forward
    verifies gamma looked-up tokens per block (greedy/tokenwise acceptance
    with one-hot q). No draft model at all."""
    import functools

    from ..config import EngineConfig, ModelConfig
    from ..models import transformer
    from ..ops.sampling import process_logits, processor, sample
    from .kvcache import init_cache, rollback

    gamma = engine.verifier.gamma
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg_target.eos_token_id

    def generate(params_t, prompt: jax.Array, prompt_len: jax.Array,
                 key: jax.Array):
        P = prompt.shape[0]
        S = P + max_new + gamma + 2
        start = jnp.broadcast_to(P - prompt_len, (1,)).astype(jnp.int32)
        cache = init_cache(cfg_target, 1, S)._replace(start=start)
        _, cache = transformer.forward(cfg_target, params_t,
                                       prompt[None, :-1], cache)
        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
        accepts = jnp.full((max_new,), -1, jnp.int32)
        dlens = jnp.full((max_new,), -1, jnp.int32)

        def cond(state):
            tokens, length, done, cache, key, accepts, dlens, blocks = state
            return (~done) & (length - P < max_new) & (blocks < max_new)

        def body(state):
            tokens, length, done, cache, key, accepts, dlens, blocks = state
            key, kv = jax.random.split(key)
            draft, n_found = propose_ngram(tokens, length, gamma, max_ngram)
            last = tokens[length - 1]
            tgt_in = jnp.concatenate([last[None], draft])[None]  # [1, gamma+1]
            tlogits, cache = transformer.forward(cfg_target, params_t,
                                                 tgt_in, cache)
            probs = temp(tlogits[0])             # [gamma+1, V]
            # accept: u <= p(x) (q == 1), only over the n_found proposed
            u = jax.random.uniform(jax.random.fold_in(kv, 0), (gamma,))
            px = jnp.take_along_axis(probs[:gamma], draft[:, None], 1)[:, 0]
            acc = (u <= px) & (jnp.arange(gamma) < n_found)
            n = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
            # residual resample (q = one-hot at the drafted token)
            rej_row = probs[jnp.clip(n, 0, gamma)]
            onehot = jax.nn.one_hot(draft[jnp.clip(n, 0, gamma - 1)],
                                    probs.shape[-1])
            resid = jnp.maximum(rej_row - onehot, 0.0)
            rs = jnp.sum(resid)
            dist = jnp.where(n >= n_found, probs[jnp.clip(n, 0, gamma)],
                             jnp.where(rs > 0, resid / jnp.maximum(rs, 1e-30),
                                       rej_row))
            t = sample(jax.random.fold_in(kv, 1), dist).astype(jnp.int32)

            posn = jnp.arange(S)
            src = jnp.take(jnp.concatenate([draft, jnp.zeros((1,), jnp.int32)]),
                           jnp.clip(posn - length, 0, gamma))
            write = (posn >= length) & (posn < length + n)
            tokens = jnp.where(write, src, tokens)
            new_length = length + n + 1
            tokens = tokens.at[jnp.clip(new_length - 1, 0, S - 1)].set(t)
            cache = rollback(cache, new_length - 1)
            done = done | jnp.any(write & (tokens == eos)) | (t == eos)
            accepts = accepts.at[blocks].set(n)
            dlens = dlens.at[blocks].set(n_found)
            return (tokens, new_length, done, cache, key, accepts, dlens,
                    blocks + 1)

        state = (tokens, jnp.int32(P), jnp.bool_(False), cache, key, accepts,
                 dlens, jnp.int32(0))
        tokens, length, _, _, _, accepts, dlens, blocks = jax.lax.while_loop(
            cond, body, state)
        length = jnp.minimum(length, P + max_new)
        gen_pos = jnp.arange(S)
        is_eos = (tokens == eos) & (gen_pos >= P) & (gen_pos < length)
        first_eos = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), length)
        length = jnp.minimum(length, first_eos + 1)
        return tokens, length, accepts, blocks

    return jax.jit(generate)
