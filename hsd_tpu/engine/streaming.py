"""Streaming speculative generation — tokens yielded per block.

Parity with the reference's generator APIs (`EaModel.ea_generate` /
`naive_generate`, ea_model.py:464-641). The fully-jitted
`make_generate` runs the whole sequence in one device call (fastest); this
variant jits ONE speculative block and loops on the host, yielding each
block's committed tokens — the structure interactive serving needs, at the
cost of one host sync per block.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..ops.sampling import process_logits, processor
from ..verify import verify
from .kvcache import init_cache, rollback, select_draft_row
from .speculative import _draft_block


def make_stream_generate(cfg_draft: ModelConfig, cfg_target: ModelConfig,
                         engine: EngineConfig):
    """Returns a python generator factory:
    stream(params_d, params_t, prompt, prompt_len, key) yields np.int32
    arrays of newly committed tokens, block by block, until EOS/budget."""
    v = engine.verifier
    gamma, K = v.gamma, v.num_drafts
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg_target.eos_token_id

    @jax.jit
    def prefill(params_d, params_t, prompt, prompt_len):
        P = prompt.shape[0]
        S = P + max_new + gamma + 2
        start = jnp.broadcast_to(P - prompt_len, (K,)).astype(jnp.int32)
        dcache = init_cache(cfg_draft, K, S)._replace(start=start)
        tcache = init_cache(cfg_target, K, S)._replace(start=start)
        pk = jnp.broadcast_to(prompt[None, :], (K, P))
        _, dcache = transformer.forward(cfg_draft, params_d, pk[:, :-2], dcache)
        _, tcache = transformer.forward(cfg_target, params_t, pk[:, :-1], tcache)
        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
        return tokens, dcache, tcache

    @jax.jit
    def block(params_d, params_t, tokens, length, dcache, tcache, key):
        kd, kv = jax.random.split(key)
        last = tokens[length - 1]
        draft_toks, q, dcache = _draft_block(
            cfg_draft, params_d, dcache, tokens[length - 2], last, kd,
            gamma, temp)
        tgt_in = jnp.concatenate(
            [jnp.broadcast_to(last, (K, 1)).astype(jnp.int32), draft_toks], 1)
        tlogits, tcache = transformer.forward(cfg_target, params_t, tgt_in,
                                              tcache)
        p = temp(tlogits)
        res = verify(v.method, kv, draft_toks, q, p, num_drafts=K)
        n_commit = res.n_matches + 1
        posn = jnp.arange(tokens.shape[0])
        src = jnp.take(res.tokens, jnp.clip(posn - length, 0, gamma))
        write = (posn >= length) & (posn < length + n_commit)
        tokens = jnp.where(write, src, tokens)
        new_length = length + n_commit
        dcache = rollback(dcache, new_length - 2)
        tcache = rollback(tcache, new_length - 1)
        if K > 1:
            dcache = select_draft_row(dcache, res.draft_index)
            tcache = select_draft_row(tcache, res.draft_index)
        return tokens, new_length, dcache, tcache, n_commit

    def stream(params_d, params_t, prompt, prompt_len, key
               ) -> Iterator[np.ndarray]:
        P = int(prompt.shape[0])
        tokens, dcache, tcache = prefill(params_d, params_t, prompt,
                                         prompt_len)
        length = jnp.int32(P)
        produced = 0
        while produced < max_new:
            key, kb = jax.random.split(key)
            tokens, length, dcache, tcache, n_commit = block(
                params_d, params_t, tokens, length, dcache, tcache, kb)
            n = int(n_commit)
            chunk = np.asarray(tokens)[int(length) - n:int(length)]
            stop = eos in chunk.tolist()
            if stop:
                chunk = chunk[:chunk.tolist().index(eos) + 1]
            room = max_new - produced
            chunk = chunk[:room]
            produced += len(chunk)
            yield chunk.astype(np.int32)
            if stop:
                return

    return stream
