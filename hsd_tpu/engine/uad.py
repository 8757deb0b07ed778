"""Universal Assisted Decoding (UAD): draft and target with DIFFERENT
tokenizers.

Parity with the reference's `AssistedCandidateGeneratorDifferentTokenizers`
(transformers/generation/candidate_generator.py:304-610, used by the harness
when the draft/target tokenizer pair differs, eval_speculative_decoding_llm.py:653):
the draft proposes in TEXT space — decode the target-token context, continue
it with the draft model under its own tokenizer, re-encode with the target
tokenizer, and align via the longest matching token prefix. Proposals carry
no usable draft logits across tokenizers, so verification is one-hot
(accept token x w.p. p(x); residual = p with x zeroed — exactly lossless,
like prompt-lookup).

Host-driven by necessity (tokenizers are host code): a jitted verify block +
a python outer loop.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..ops.sampling import process_logits, processor, sample
from .kvcache import init_cache, rollback


def align_suffix(old_ids: List[int], new_ids: List[int]) -> int:
    """Length of the longest common prefix — the reference aligns re-encoded
    text against the existing ids this way (diagonal/LCS prefix matching)."""
    n = 0
    for a, b in zip(old_ids, new_ids):
        if a != b:
            break
        n += 1
    return n


class UadDrafter:
    """Text-space proposal: target ids -> up to gamma NEW target ids."""

    def __init__(self, target_tokenizer, draft_tokenizer,
                 draft_continue: Callable[[str, int], str],
                 chars_per_token: int = 8):
        self.ttok = target_tokenizer
        self.dtok = draft_tokenizer
        self.draft_continue = draft_continue
        self.cpt = chars_per_token

    def propose(self, target_ids: List[int], gamma: int) -> List[int]:
        text = self.ttok.decode(target_ids)
        cont = self.draft_continue(text, gamma * self.cpt)
        if not cont:
            return []
        new_ids = self.ttok.encode(text + cont)
        keep = align_suffix(target_ids, new_ids)
        return list(new_ids[keep:keep + gamma]) if keep == len(target_ids) \
            else list(new_ids[len(target_ids):len(target_ids) + gamma])


def make_uad_generate(cfg_t: ModelConfig, engine: EngineConfig,
                      drafter: UadDrafter):
    """Speculative decoding with a different-tokenizer draft. Returns
    generate(params_t, prompt_ids: List[int], key) -> List[int] new ids."""
    gamma = engine.verifier.gamma
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg_t.eos_token_id

    @jax.jit
    def prefill(params_t, prompt):
        P = prompt.shape[0]
        S = P + max_new + gamma + 2
        cache = init_cache(cfg_t, 1, S)
        _, cache = transformer.forward(cfg_t, params_t, prompt[None, :-1],
                                       cache)
        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt)
        return tokens, cache

    @jax.jit
    def verify_block(params_t, tokens, length, cache, draft, n_found, key):
        """One-hot acceptance of up to gamma proposed tokens (lossless)."""
        last = tokens[length - 1]
        tgt_in = jnp.concatenate([last[None], draft])[None]
        tlogits, cache = transformer.forward(cfg_t, params_t, tgt_in, cache)
        probs = temp(tlogits[0])
        u = jax.random.uniform(jax.random.fold_in(key, 0), (gamma,))
        px = jnp.take_along_axis(probs[:gamma],
                                 jnp.clip(draft, 0, probs.shape[-1] - 1)[:, None],
                                 1)[:, 0]
        acc = (u <= px) & (jnp.arange(gamma) < n_found)
        n = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))
        rej_row = probs[jnp.clip(n, 0, gamma)]
        onehot = jax.nn.one_hot(draft[jnp.clip(n, 0, gamma - 1)],
                                probs.shape[-1])
        resid = jnp.maximum(rej_row - onehot, 0.0)
        rs = jnp.sum(resid)
        dist = jnp.where(n >= n_found, probs[jnp.clip(n, 0, gamma)],
                         jnp.where(rs > 0, resid / jnp.maximum(rs, 1e-30),
                                   rej_row))
        t = sample(jax.random.fold_in(key, 1), dist).astype(jnp.int32)
        posn = jnp.arange(tokens.shape[0])
        src = jnp.take(jnp.concatenate([draft, jnp.zeros((1,), jnp.int32)]),
                       jnp.clip(posn - length, 0, gamma))
        write = (posn >= length) & (posn < length + n)
        tokens = jnp.where(write, src, tokens)
        new_length = length + n + 1
        tokens = tokens.at[new_length - 1].set(t)
        cache = rollback(cache, new_length - 1)
        return tokens, new_length, cache, n

    def generate(params_t, prompt_ids: List[int], key) -> List[int]:
        prompt = jnp.asarray(prompt_ids, jnp.int32)
        P = len(prompt_ids)
        tokens, cache = prefill(params_t, prompt)
        length = jnp.int32(P)
        while int(length) - P < max_new:
            ctx = np.asarray(tokens)[:int(length)].tolist()
            prop = drafter.propose(ctx, gamma)
            draft = jnp.asarray((prop + [0] * gamma)[:gamma], jnp.int32)
            key, kb = jax.random.split(key)
            tokens, length, cache, n = verify_block(
                params_t, tokens, length, cache, draft,
                jnp.int32(len(prop)), kb)
            out = np.asarray(tokens)[P:int(length)]
            if eos in out.tolist():
                return out.tolist()[:out.tolist().index(eos) + 1]
        return np.asarray(tokens)[P:P + max_new].tolist()

    return generate
