"""Forward-sampling verification step (the reference's `_forward_sampling`,
transformers/generation/utils.py:5182-5240).

Used by the NON-clever HSD mode: after the backward (step-back) pass, the
engine drafts ONE token per inner step over the accumulated candidate and
verifies it against the JOINT divergence at the frontier position:

  Jp = prod p_i, Jq = prod q_i over the accumulated draft;
  diffs = Jp_prev * p_last - Jq_prev * q_last (full-vocab rows);
  resample t ~ norm(diffs+ / max(sum+, sum-));
  the drafted token is accepted (with a bonus draw from p) only when the
  resampled token EQUALS it (ref :5229-5236).

The clever (capped) single-pass mode makes this inner loop unnecessary —
SURVEY.md §2.4(c)8 — so the engine's primary path never calls this; it is
provided for behavioral parity and experimentation. Scale-free log-space
formulation as in verify/hsd.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .common import TINY, categorical


def forward_sampling_step(key: jax.Array, cand_tokens: jax.Array,
                          q: jax.Array, p: jax.Array, cand_len: jax.Array,
                          last_step: bool = False
                          ) -> Tuple[jax.Array, jax.Array]:
    """One forward-sampling verification.

    cand_tokens: [L] accumulated draft tokens (valid prefix cand_len);
    q, p: [L, V] draft/target rows aligned with the tokens (p[j] is the
    target distribution AT position j); p must have an extra row at
    cand_len for the bonus draw, i.e. shape [L+1, V] is accepted too.
    Returns (tokens [2], n): tokens[0] = resampled token; when last_step and
    tokens[0] equals the drafted frontier token, tokens[1] = bonus draw and
    n = 1, else n = 0 and tokens[1] is unused.
    """
    L = cand_tokens.shape[0]
    rel = jnp.arange(L)
    valid = rel < cand_len
    xc = jnp.clip(cand_tokens, 0, q.shape[-1] - 1)
    q_i = jnp.where(valid, jnp.take_along_axis(q[:L], xc[:, None], 1)[:, 0], 1.0)
    p_i = jnp.where(valid, jnp.take_along_axis(p[:L], xc[:, None], 1)[:, 0], 1.0)
    log_jq = jnp.cumsum(jnp.log(jnp.maximum(q_i, TINY)))
    log_jp = jnp.cumsum(jnp.where(p_i > 0, jnp.log(jnp.maximum(p_i, TINY)),
                                  -jnp.inf))
    last = jnp.clip(cand_len - 1, 0, L - 1)
    # scale-free: diffs / Jq_prev
    log_jp_prev = jnp.where(cand_len > 1, log_jp[jnp.clip(last - 1, 0, L - 1)],
                            0.0)
    log_jq_prev = jnp.where(cand_len > 1, log_jq[jnp.clip(last - 1, 0, L - 1)],
                            0.0)
    r = jnp.exp(jnp.minimum(log_jp_prev - log_jq_prev, 80.0))
    diffs = r * p[last] - q[last]
    plus = jnp.maximum(diffs, 0.0)
    denom = jnp.maximum(jnp.sum(plus), jnp.sum(jnp.maximum(-diffs, 0.0)))
    resid = jnp.where(denom > 0, plus / jnp.maximum(denom, TINY), p[last])
    rs = jnp.sum(resid)
    resid = jnp.where(rs > 0, resid / jnp.maximum(rs, TINY), p[last])
    t = categorical(jax.random.fold_in(key, 0), resid).astype(jnp.int32)
    frontier_tok = cand_tokens[last]
    accept = jnp.logical_and(last_step, t == frontier_tok)
    bonus_row = jnp.clip(cand_len, 0, p.shape[0] - 1)
    b = categorical(jax.random.fold_in(key, 1), p[bonus_row]).astype(jnp.int32)
    n = jnp.where(accept, 1, 0).astype(jnp.int32)
    return jnp.stack([t, jnp.where(accept, b, t)]), n
