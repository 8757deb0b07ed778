"""Blockwise verification (Sun et al., "Block Verification Accelerates
Speculative Decoding").

Behavioral spec re-derived from the reference's `blockwise=True` branch
(`transformers/generation/utils.py:5585-5658`), single draft:

  carry a running accept probability a (init 1). At each position i < gamma,
  sample from the concatenation [max(p_i*a - q_i, 0), 1-a]:
    - drawing the extra index means "keep the draft token and continue";
    - drawing a vocab token v means "the output (so far) is draft[:i] + [v]" —
      later positions may still overwrite this choice (the reference loop has
      no break; the LAST overwrite wins).
    - a zero-mass weight vector means p*a == q pointwise -> keep token i
      unconditionally (output draft[:i+1] with no replacement tail).
  Then update a <- min(1, a * p_i/q_i).
  At the bonus position: accept w.p. a and sample the bonus token from p[gamma].

Implemented as a lax.scan over positions with an (n, tail_token, has_tail, a)
carry — fixed shapes, no host syncs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (TINY, VerifyResult, categorical, gather_token_probs,
                     scatter_commit)


def verify_blockwise(key: jax.Array, draft_tokens: jax.Array, q: jax.Array,
                     p: jax.Array):
    """Single-draft blockwise verification (K must be 1)."""
    assert draft_tokens.shape[0] == 1, "blockwise verification is single-draft"
    gamma = draft_tokens.shape[1]
    V = p.shape[-1]
    x = draft_tokens[0]
    qm = q[0].astype(jnp.float32)
    pm = p[0].astype(jnp.float32)
    q_i = gather_token_probs(qm, x)
    p_i = gather_token_probs(pm[:gamma], x)
    ratio = p_i / jnp.maximum(q_i, TINY)

    def body(carry, inp):
        n, tail, has_tail, a = carry
        i, r_i = inp
        weights = jnp.maximum(pm[i] * a - qm[i], 0.0)           # [V]
        reject_w = jnp.maximum(1.0 - a, 0.0)
        total = jnp.sum(weights) + reject_w
        zero_mass = total <= 0
        # sample from [weights, reject_w]
        kk = jax.random.fold_in(key, i)
        logits = jnp.concatenate([jnp.log(jnp.maximum(weights, 0.0)),
                                  jnp.log(jnp.maximum(reject_w, 0.0))[None]])
        c = jax.random.categorical(kk, jnp.where(zero_mass, 0.0, logits))
        replaced = (~zero_mass) & (c < V)
        # zero-mass: keep token i unconditionally, no tail
        n = jnp.where(zero_mass, i + 1, jnp.where(replaced, i, n))
        tail = jnp.where(replaced, c.astype(jnp.int32), tail)
        has_tail = jnp.where(zero_mass, False, jnp.where(replaced, True, has_tail))
        a = jnp.minimum(1.0, a * r_i)
        return (n, tail, has_tail, a), None

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(True), jnp.float32(1.0))
    # position 0 starts with a=1 -> weights = max(p-q, 0), reject_w = 0:
    # the initial state "has_tail with tail from residual at 0" is established
    # by the first scan step itself; start with has_tail True + dummy tail so a
    # degenerate all-reject path still emits one resampled token.
    (n, tail, has_tail, a), _ = jax.lax.scan(
        body, init, (jnp.arange(gamma), ratio))

    # bonus position (ref :5634-5649)
    u = jax.random.uniform(jax.random.fold_in(key, gamma + 1), ())
    bonus_accepted = u >= (1.0 - a)
    bonus = categorical(jax.random.fold_in(key, gamma + 2), pm[gamma])
    n = jnp.where(bonus_accepted, gamma, n)
    tail = jnp.where(bonus_accepted, bonus.astype(jnp.int32), tail)
    has_tail = jnp.where(bonus_accepted, True, has_tail)

    # commit: draft[:n] + tail (if any). When has_tail is False the output is
    # exactly n draft tokens; encode that as n_matches = n - 1 with the last
    # draft token as the "extra" so the engine's n_matches+1 commit length
    # stays uniform.
    n_eff = jnp.where(has_tail, n, n - 1)
    extra = jnp.where(has_tail, tail, x[jnp.clip(n - 1, 0, gamma - 1)])
    tokens = scatter_commit(x, extra, n_eff)
    return VerifyResult(tokens=tokens, n_matches=n_eff,
                        draft_index=jnp.int32(0), rounds=jnp.int32(1))


def verify_greedy(key: jax.Array, draft_tokens: jax.Array, q: jax.Array,
                  p: jax.Array):
    """Greedy (temperature 0) verification: accept the longest prefix of draft
    tokens matching argmax of the target, then emit the target argmax at the
    first mismatch / bonus position (ref: EAGLE utils.py:362-375)."""
    del key, q
    gamma = draft_tokens.shape[1]
    x = draft_tokens[0]
    tgt = jnp.argmax(p[0], axis=-1).astype(jnp.int32)  # [gamma+1]
    match = (x == tgt[:gamma]).astype(jnp.int32)
    n = jnp.sum(jnp.cumprod(match))
    extra = tgt[jnp.clip(n, 0, gamma)]
    tokens = scatter_commit(x, extra, n)
    return VerifyResult(tokens=tokens, n_matches=n,
                        draft_index=jnp.int32(0), rounds=jnp.int32(1))
