"""Recursive backward verification round (the reference's `recursive=True`
inner step, repaired).

The committed reference dispatches recursive inner steps to
`_speculative_sampling(..., hist_lengths=hist_lengths)`
(transformers/generation/utils.py:4888-4898), but the committed function
signature has no such parameter (utils.py:5243-5257) — the mode is dead code
as shipped (SURVEY.md §0). This module re-derives the intended round from the
surrounding engine wiring (utils.py:4674-4687: each inner round re-drafts the
REMAINING block budget onto the accumulated candidate, accumulates the
per-position draft logits, and re-verifies the WHOLE accumulated candidate,
with `hist_lengths` recording the per-round committed prefix lengths):

  one round = the committed backward verifier (raw, non-clever joints —
  `recursive` is reachable only with `clever=False`, utils.py:4882-4898)
  applied to the block's accumulated trajectory, where

  * joint prefix products run from the BLOCK START along the committed
    trajectory — history positions contribute their p_i/q_i factors but
    cannot be stepped back to,
  * **history p-rows are the previous round's residuals**: the reference's
    docstring spec (utils.py:5259-5277) is explicit — each round "calculate
    p_prime based on p_i and q_i for each previously sampled token, treat
    p_prime as p_i, q_i stays the same". `recursive_round` therefore returns
    its per-position normalized residual rows and the engine substitutes
    them for the committed history's p-rows before the next round (the
    single-position analogue in the multidraft carry is
    `p_new[:, 0] = p_primes[:, current_step_match]`, utils.py:5317-5324).
    This is what makes the recursion *hierarchical*: round r verifies
    against the residual measure left over by round r-1, and a committed
    resample (drawn from its residual) contributes p'_k(x_k) > 0 rather
    than a raw-target factor,
  * a zero history factor kills everything after it (the reference's
    `zero_after_first_zero`, utils.py:5304-5314) — implemented implicitly
    by the log-space cumulative products: one -inf zeroes every later
    prefix ratio,
  * the step-back pass covers only the new tail [hist_len, cand_len)
    (ref utils.py:5473-5491 restricted to non-history positions),
  * the frontier accept-all test uses the raw joint ratio over the whole
    trajectory (ref utils.py:5519-5526),
  * on rejection the commit is (accepted tail tokens + one resample from the
    stop position's joint residual, ref :5551-5579); on full acceptance the
    whole tail commits and a bonus token is drawn from the target's
    next-position row ("no bonus token unless gamma-n-1 tokens are
    accepted", utils.py:5271).

With `hist_len=0` over a fresh draft this is exactly one round of
`verify_hsd(frontier='raw')` (the committed single-pass verifier), and with a
one-token tail it is `forward_sampling_step`'s joint-residual resample plus
the frontier test. Like `hsd_ref`, the raw frontier carries a small
within-block bias (measured and pinned in tests); `method='hsd'` remains the
exact lossless rule (docs/LOSSLESSNESS.md).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .common import TINY, categorical, gather_token_probs, last_true_index, \
    normalize


def _safe_log(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0, jnp.log(jnp.maximum(x, TINY)), -jnp.inf)


def recursive_round(key: jax.Array, cand_tokens: jax.Array, q: jax.Array,
                    p: jax.Array, hist_len: jax.Array, cand_len: jax.Array
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One recursive backward verification round over a block trajectory.

    cand_tokens: [gamma] block trajectory (committed history then the fresh
      tail); q: [gamma, V] draft rows along the trajectory; p: [gamma+1, V]
      target rows (p[cand_len] is the bonus row).
    hist_len: committed prefix length (cannot be stepped back);
    cand_len: trajectory length (hist_len < cand_len <= gamma).

    The caller maintains the recursion: rows of `p` at HISTORY positions must
    be the previous round's residual rows (see module docstring) — the engine
    substitutes the returned `resid_rows` after each non-full round.

    Returns (tokens [gamma+1], n_commit, full, resid_rows [gamma, V]):
    tokens[:n_commit] are this round's newly committed tokens (accepted tail
    + resample, or full tail + bonus when `full`); resid_rows are this
    round's per-position normalized residuals (zero rows where the joint
    divergence has no positive part).
    """
    L = cand_tokens.shape[0]
    V = q.shape[-1]
    rel = jnp.arange(L)
    valid = rel < cand_len
    is_tail = valid & (rel >= hist_len)
    xc = jnp.clip(cand_tokens, 0, V - 1)
    q_rows = q[:L].astype(jnp.float32)
    p_rows = p[:L].astype(jnp.float32)
    q_i = jnp.where(valid, gather_token_probs(q_rows, xc), 1.0)
    p_i = jnp.where(valid, gather_token_probs(p_rows, xc), 1.0)
    log_q_i = jnp.where(valid, jnp.log(jnp.maximum(q_i, TINY)), 0.0)
    log_p_i = jnp.where(valid, _safe_log(p_i), 0.0)

    # joint prefix products from the block start (exclusive), raw — the
    # non-clever form has no capping, so the prefix ratio may exceed 1; the
    # exponent is bounded for float32 safety (as in forward_sampling_step).
    log_jq_prev = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(log_q_i)[:-1]])
    log_jp_prev = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(log_p_i)[:-1]])
    r = jnp.exp(jnp.minimum(log_jp_prev - log_jq_prev, 80.0))

    # scale-free joint divergence (reference diffs / Jq[k] — see verify/hsd.py)
    diffs = r[:, None] * p_rows - q_rows
    plus = jnp.maximum(diffs, 0.0)
    s_plus = jnp.sum(plus, axis=-1)
    s_minus = jnp.sum(jnp.maximum(-diffs, 0.0), axis=-1)
    denom = jnp.maximum(s_plus, s_minus)
    p_primes = jnp.where(denom[:, None] > 0,
                         plus / jnp.maximum(denom, TINY)[:, None], 0.0)
    sbp = jnp.where(denom > 0, 1.0 - s_plus / jnp.maximum(denom, TINY), 0.0)
    sbp = jnp.clip(sbp, 0.0, 1.0)

    u = jax.random.uniform(jax.random.fold_in(key, 0), (L,))
    not_stepped_back = (u >= sbp) & is_tail
    stop = jnp.where(jnp.any(not_stepped_back),
                     last_true_index(not_stepped_back), hist_len)

    # frontier acceptance over the whole accumulated trajectory (raw ratio)
    log_joint_ratio = jnp.sum(log_p_i - log_q_i)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), ())
    full = jnp.log(jnp.maximum(u2, TINY)) <= log_joint_ratio
    csm = jnp.where(full, cand_len, stop)

    stop_row = jnp.clip(csm, 0, L - 1)
    onehot = jax.nn.one_hot(xc[stop_row], V, dtype=jnp.float32)
    resid = normalize(p_primes[stop_row], fallback=onehot)
    bonus_row = jnp.clip(cand_len, 0, p.shape[0] - 1)
    final_dist = jnp.where(full, p[bonus_row].astype(jnp.float32), resid)
    t = categorical(jax.random.fold_in(key, 2), final_dist).astype(jnp.int32)

    n_acc = csm - hist_len                      # accepted drafted tail tokens
    out_rel = jnp.arange(L + 1)
    src = jnp.take(cand_tokens, jnp.clip(out_rel + hist_len, 0, L - 1))
    out = jnp.where(out_rel < n_acc, src, 0).astype(jnp.int32)
    out = out.at[jnp.clip(n_acc, 0, L)].set(t)
    # per-position normalized residuals for the caller's p-row substitution
    # ("treat p_prime as p_i", ref utils.py:5259-5277 + renormalization at
    # :5320-5325); rows with no positive divergence stay zero (the reference
    # keeps zero rows after guarding the sum, :5321-5322)
    resid_rows = jnp.where(s_plus[:, None] > 0,
                           plus / jnp.maximum(s_plus, TINY)[:, None], 0.0)
    return out, (n_acc + 1).astype(jnp.int32), full, resid_rows
