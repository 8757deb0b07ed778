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
    """Length of the longest common prefix (the simple alignment; kept for
    the no-drift fast path and tests)."""
    n = 0
    for a, b in zip(old_ids, new_ids):
        if a != b:
            break
        n += 1
    return n


def longest_diag_run(old: List[int], new: List[int]):
    """Longest diagonal run of equality between `new` (re-encoded window)
    and `old` (committed window): returns (i, j, length) with
    new[i + t] == old[j + t] for t < length, or None when the two windows
    share no token at all.

    Re-derivation of the reference's `_get_longest_diag_dict` /
    `_get_longest_diag_index` (transformers/generation/
    candidate_generator.py:358-420) — the reference walks every nonzero cell of
    the compare matrix in a python loop; here each diagonal's run lengths
    come from one vectorized cumulative-run pass over the boolean matrix.
    Ties break toward the EARLIEST diagonal start (row-major argmax), the
    same cell the reference's first-argmax picks."""
    if not old or not new:
        return None
    a = np.asarray(old)
    b = np.asarray(new)
    m = b[:, None] == a[None, :]                     # [len(new), len(old)]
    if not m.any():
        return None
    # run[i, j] = length of the match run ENDING at (i, j) along its
    # diagonal: pad, then run = m * (1 + run_shifted_up_left)
    run = np.zeros_like(m, dtype=np.int32)
    for i in range(m.shape[0]):                       # rows are ~lookbehind
        prev = np.concatenate([[0], run[i - 1, :-1]]) if i else \
            np.zeros((m.shape[1],), np.int32)
        run[i] = np.where(m[i], prev + 1, 0)
    length = int(run.max())
    ends = np.argwhere(run == length)
    # earliest START in row-major order (i - length + 1, then j)
    starts = ends - (length - 1)
    order = np.lexsort((starts[:, 1], starts[:, 0]))
    i0, j0 = starts[order[0]]
    return int(i0), int(j0), length


def split_new_tokens(old_window: List[int], reencoded: List[int]):
    """Split a re-encoded window against the committed one: returns
    (discrepancy_length, new_tokens, discrepancy_tokens) or None when the
    windows don't intersect.

    Semantics match the reference's `_get_tokens_diag`
    (candidate_generator.py:420-448): the longest diagonal aligns the two
    encodings; everything in `reencoded` past the diagonal that still
    OVERLAPS the committed window re-tokenized differently (the
    `discrepancy`), and only tokens past that overlap are genuinely new."""
    hit = longest_diag_run(old_window, reencoded)
    if hit is None:
        return None
    i0, j0, length = hit
    new_start = i0 + length                # first reencoded idx past match
    disc_with_old = j0 + length            # first committed idx past match
    disc_len = max(len(old_window) - disc_with_old, 0)
    discrepancy = list(reencoded[new_start:new_start + disc_len])
    new_tokens = list(reencoded[new_start + disc_len:])
    return disc_len, new_tokens, discrepancy


class UadDrafter:
    """Text-space proposal: target ids -> up to gamma NEW target ids.

    Alignment is WINDOWED diagonal matching (reference
    `AssistedCandidateGeneratorDifferentTokenizers`, candidate_generator.py
    :358-448 and the assistant_lookbehind logic at :560-584): only the last
    `lookbehind` committed tokens re-encode each round, and the re-encoded
    window diagonal-matches against the committed window — so proposals
    survive re-tokenization drift (e.g. a BPE merge across the
    committed/continuation boundary), where longest-common-PREFIX alignment
    silently discards them. The committed target stream stays authoritative:
    drift over committed positions (the `discrepancy`) is skipped, never
    rewritten, so one-hot verification stays exactly lossless."""

    def __init__(self, target_tokenizer, draft_tokenizer,
                 draft_continue: Callable[[str, int], str],
                 chars_per_token: int = 8, lookbehind: int = 10):
        self.ttok = target_tokenizer
        self.dtok = draft_tokenizer
        self.draft_continue = draft_continue
        self.cpt = chars_per_token
        self.lookbehind = lookbehind

    def propose(self, target_ids: List[int], gamma: int) -> List[int]:
        text = self.ttok.decode(target_ids)
        cont = self.draft_continue(text, gamma * self.cpt)
        if not cont:
            return []
        window = list(target_ids[-self.lookbehind:])
        wtext = self.ttok.decode(window)
        reenc = list(self.ttok.encode(wtext + cont))
        # no-drift fast path: the window re-encodes to an exact prefix
        if reenc[:len(window)] == window:
            return reenc[len(window):len(window) + gamma]
        got = split_new_tokens(window, reenc)
        if got is None:
            return []
        _, new_tokens, _ = got
        return new_tokens[:gamma]


class UadTokenDrafter:
    """Token-level UAD drafter: the draft model consumes its OWN token ids
    and keeps its id history across rounds — the full two-sided protocol of
    the reference's `get_candidates` (candidate_generator.py:466-598):

      1. target->draft: re-encode only the last `target_lookbehind`
         committed target tokens (plus everything accepted since the
         previous round) into draft ids; diagonal-match against the draft
         history suffix; REPLACE the history tail that re-tokenized
         differently (the discrepancy) and append the new draft ids.
      2. draft continuation over the maintained draft-id history
         (`draft_continue_ids(ids, n) -> new draft ids`).
      3. draft->target: re-encode the last `assistant_lookbehind` history
         tokens plus the continuation into target ids; diagonal-match
         against the committed target window; propose only the tokens past
         the overlap.

    The draft history repair is what lets a draft model reuse its own
    context (KV) across rounds despite re-tokenization drift; the proposal
    split is what keeps drift from zeroing the acceptance rate."""

    def __init__(self, target_tokenizer, draft_tokenizer,
                 draft_continue_ids: Callable[[List[int], int], List[int]],
                 tokens_per_target_token: int = 2,
                 target_lookbehind: int = 10, assistant_lookbehind: int = 10):
        self.ttok = target_tokenizer
        self.dtok = draft_tokenizer
        self.draft_continue_ids = draft_continue_ids
        self.tpt = tokens_per_target_token
        self.target_lookbehind = target_lookbehind
        self.assistant_lookbehind = assistant_lookbehind
        self.draft_ids: List[int] = []     # maintained draft-token history
        self.prev_target_len = 0

    def _to_draft(self, target_ids: List[int]) -> List[int]:
        return list(self.dtok.encode(self.ttok.decode(target_ids)))

    def propose(self, target_ids: List[int], gamma: int) -> List[int]:
        target_ids = list(target_ids)
        if not self.draft_ids or self.prev_target_len <= self.target_lookbehind:
            self.draft_ids = self._to_draft(target_ids)
        else:
            # window covers the last lookbehind of the PREVIOUS round's
            # target length plus all newly accepted tokens (reference
            # start_index_in_target_window, candidate_generator.py:568)
            start = self.prev_target_len - self.target_lookbehind
            win_draft = self._to_draft(target_ids[start:])
            use = self.draft_ids[-len(win_draft):] if win_draft else []
            got = split_new_tokens(use, win_draft)
            if got is None:
                self.draft_ids = self.draft_ids + win_draft
            else:
                disc_len, new_tokens, disc = got
                if disc_len > 0 and disc:
                    if disc_len >= len(disc):
                        # drop the drifted tail, substitute its re-encoding
                        drop = disc_len if disc_len == len(disc) else \
                            disc_len
                        self.draft_ids = (self.draft_ids[:-drop] + disc) \
                            if drop <= len(self.draft_ids) else list(disc)
                self.draft_ids = self.draft_ids + new_tokens
        self.prev_target_len = len(target_ids)

        n_draft = max(gamma * self.tpt, 1)
        cont = list(self.draft_continue_ids(list(self.draft_ids), n_draft))
        if not cont:
            return []
        self.draft_ids = self.draft_ids + cont

        look = self.draft_ids[-(self.assistant_lookbehind + len(cont)):]
        reenc_t = list(self.ttok.encode(self.dtok.decode(look)))
        window_t = target_ids[-len(reenc_t):] if reenc_t else []
        got = split_new_tokens(window_t, reenc_t)
        if got is None:
            return []
        _, new_target, _ = got
        return new_target[:gamma]


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
