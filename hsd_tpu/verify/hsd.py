"""Hierarchical Speculative Decoding (HSD) verification — the clever
(smart-capping) single-pass form, with multidraft recursive reseeding.

Behavioral spec re-derived from the reference's `backward=True` branch of
`_speculative_sampling` (`transformers/generation/utils.py:5278-5583`) and the
`algorithm.py` sketch; see SURVEY.md §2.4(c). The shipped benchmarks use this
clever form (`eval_speculative_qwen_backward_clever.sh`).

Math, per round over the window of not-yet-accepted positions k = 0..L-1
(L = gamma - n_matches), draft tokens x_k with draft probs q_k = q(x_k|·) and
target probs p_k = p(x_k|·):

  1. joint prefix products  Jq[k] = seed_q * prod_{j<k} q_j,
                            Jp[k] = seed_p * prod_{j<k} p_j.
  2. smart capping: cap[k] = running max of max(Jp/Jq, 1); the capped joint
     target prefix  Jp~[k] = Jp[k]/cap[k]  never exceeds Jq[k], which removes
     the need for forward re-sampling steps (ref :5364-5378, :5428-5443).
  3. joint divergence over the vocab at each position:
        diffs[k,:] = Jp~[k]*p[k,:] - Jq[k]*q[k,:]
        p'[k,:]    = diffs+ / max(sum diffs+, sum diffs-)
     (sum of p'[k] = accept probability of sub-branch k).
  4. step-back sampling: each position independently steps back w.p.
     1 - sum(p'[k]); the stop position is the LAST position that did not step
     back (0 if all did) (ref :5473-5491).
  5. joint acceptance at the frontier: the whole window is accepted iff
     u <= prod_k p_k/q_k (ref :5519-5526); otherwise n_matches advances to the
     stop position and one token is resampled from normalized p'[stop].
  6. multidraft (K>1): later drafts with a matching accepted prefix restart at
     the stop position with the *previous residual* p'[stop] substituted for
     the target distribution there and joint products reseeded from
     Jq[stop], Jp[stop] (ref :5300-5343).

TPU-native reformulation (the key deviation from the reference): the reference
computes raw joint products and needs float64 (`softmax().double()`), which is
emulated and slow on TPU. All prefix products here live in LOG space and the
divergence is computed in a scale-free form,
      diffs[k,:] = r[k]*p[k,:] - q[k,:],   r[k] = exp(log Jp~[k] - log Jq[k]),
which is the reference's diffs divided by Jq[k] > 0 — invariant for p' and the
step-back probability, and exactly representable in float32 (r in [0,1]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (TINY, Telemetry, VerifyResult, categorical,
                     gather_token_probs, normalize, prefix_matches,
                     scatter_commit, last_true_index, window_index)


def _safe_log(x: jax.Array) -> jax.Array:
    """log with exact zeros mapped to -inf (no NaNs)."""
    return jnp.where(x > 0, jnp.log(jnp.maximum(x, TINY)), -jnp.inf)


def verify_hsd(key: jax.Array, draft_tokens: jax.Array, q: jax.Array,
               p: jax.Array, return_telemetry: bool = False,
               num_drafts: int = 0, striped: bool = False,
               frontier: str = "capped"):
    """HSD-clever verification over K drafts.

    parallel mode (striped=False): K independent full drafts with prefix
    gating; striped mode: row n_matches*(K-1)+b per round, no gate
    (ref utils.py:5297) — see verify_tokenwise for the row layout.

    frontier: 'capped' (default) accepts the window with probability
      min(1, rhat_{L-1} * p_{L-1}/q_{L-1}) where rhat is the CAPPED prefix
      ratio — telescoping the hierarchy's mass-balance equations shows this
      is the choice that makes the whole block EXACTLY lossless, verified by
      noise-free enumeration (docs/LOSSLESSNESS.md). 'raw' reproduces the
      committed reference (utils.py:5519, raw cumprod(p_i/q_i)), which
      carries a small within-block bias; the reference's own commented-out
      block (:5498-5512) suggests the capped form was intended.
    """
    R, gamma = draft_tokens.shape
    K = num_drafts if num_drafts else R
    V = p.shape[-1]
    rel = jnp.arange(gamma)

    n = jnp.int32(0)              # accepted tokens so far (global)
    ind = jnp.int32(0)            # committed draft row
    done = jnp.bool_(False)
    rounds = jnp.int32(0)
    resid_row = jnp.zeros((V,), jnp.float32)   # unnormalized p'[stop] carry
    log_jq_seed = jnp.float32(0.0)             # log Jq at the restart position
    log_jp_seed = jnp.float32(0.0)             # log Jp at the restart position
    has_seed = jnp.bool_(False)                # restart row uses carried residual?
    tel_sbp = jnp.zeros((K, gamma), jnp.float32)   # one row per round
    tel_p = jnp.zeros((K, gamma), jnp.float32)
    tel_q = jnp.zeros((K, gamma), jnp.float32)

    for b in range(K):
        if striped:
            row = jnp.clip(n * (K - 1) + b, 0, R - 1)
            if frontier == "capped":
                # exactness fix: gate branch rows on the accepted prefix
                # still following the primary path (see verify_tokenwise;
                # ungated = reference behavior, kept under hsd_ref)
                active = (~done) & prefix_matches(draft_tokens, row, ind, n)
            else:
                active = ~done
        else:
            row = jnp.int32(b)
            active = (~done) & prefix_matches(draft_tokens, row, ind, n)
        d_row = jnp.take(draft_tokens, row, axis=0)
        q_all = jnp.take(q, row, axis=0)
        p_all = jnp.take(p, row, axis=0)
        idx, valid = window_index(n, gamma)
        x = d_row[idx]

        q_rows = q_all[idx, :].astype(jnp.float32)
        p_rows = p_all[idx, :].astype(jnp.float32)
        # b>0 restart: substitute the stop row's distribution with the carried
        # residual, normalized (ref :5317-5324). Rows of p are already
        # normalized; only the substituted row needs it.
        row0 = normalize(resid_row, fallback=jnp.zeros((V,), jnp.float32))
        p_rows = p_rows.at[0].set(jnp.where(has_seed, row0, p_rows[0]))

        q_i = jnp.where(valid, gather_token_probs(q_rows, x), 1.0)
        p_i = jnp.where(valid, gather_token_probs(p_rows, x), 1.0)

        log_q_i = jnp.where(valid, _safe_log(jnp.maximum(q_i, TINY)), 0.0)
        log_p_i = jnp.where(valid, _safe_log(p_i), 0.0)
        # NOTE: the reference applies `zero_after_first_zero` to p_i for b>0
        # (ref :5304-5328); in log space a zero p_i propagates -inf through the
        # prefix cumsum automatically, so no extra masking is needed.

        seed_q = jnp.where(has_seed, log_jq_seed, 0.0)
        seed_p = jnp.where(has_seed, log_jp_seed, 0.0)
        log_jq_prev = seed_q + jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(log_q_i)[:-1]])
        log_jp_prev = seed_p + jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(log_p_i)[:-1]])

        # smart capping in log space (ref :5428-5443)
        log_ratio = log_jp_prev - log_jq_prev
        log_cap = jax.lax.cummax(jnp.maximum(log_ratio, 0.0))
        r = jnp.exp(log_jp_prev - log_cap - log_jq_prev)  # in [0, 1]

        # scale-free joint divergence (reference diffs / Jq[k])
        diffs = r[:, None] * p_rows - q_rows
        p_plus = jnp.maximum(diffs, 0.0)
        s_plus = jnp.sum(p_plus, axis=-1)
        s_minus = jnp.sum(jnp.maximum(-diffs, 0.0), axis=-1)
        denom = jnp.maximum(s_plus, s_minus)
        p_primes = jnp.where(denom[:, None] > 0, p_plus / jnp.maximum(denom, TINY)[:, None], 0.0)

        # step-back probabilities; denom == 0 means the capped joint target
        # equals the joint draft on this branch -> never step back (the
        # reference reaches the same behavior through NaN comparison
        # semantics, ref :5466-5473).
        sbp = jnp.where(denom > 0, 1.0 - s_plus / jnp.maximum(denom, TINY), 0.0)
        sbp = jnp.clip(sbp, 0.0, 1.0)
        sbp_masked = jnp.where(valid, sbp, 1.0)   # padding always steps back

        u = jax.random.uniform(jax.random.fold_in(key, 3 * b), (gamma,))
        not_stepped_back = (u >= sbp_masked)
        stop_rel = last_true_index(not_stepped_back)

        # frontier acceptance over the whole window
        num_valid = jnp.sum(valid.astype(jnp.int32))
        if frontier == "capped":
            # exact rule: capped prefix ratio x last-position ratio — the
            # choice that telescopes the hierarchy's mass balance exactly
            log_acc = (log_jp_prev - log_cap - log_jq_prev) + log_p_i - log_q_i
            log_joint_ratio = log_acc[jnp.clip(num_valid - 1, 0, gamma - 1)]
        else:
            # reference behavior: raw joint ratio (utils.py:5519)
            log_joint_ratio = jnp.sum(log_p_i - log_q_i)
        u2 = jax.random.uniform(jax.random.fold_in(key, 3 * b + 1), ())
        accept_all = jnp.log(jnp.maximum(u2, TINY)) <= log_joint_ratio
        csm = jnp.where(accept_all, num_valid, stop_rel)
        n_new = n + csm
        full = n_new == gamma

        # carries for the next round (ref :5317-5343): residual and joint
        # seeds at the stop position.
        stop_row = jnp.clip(csm, 0, gamma - 1)
        new_resid = p_primes[stop_row]
        new_log_jq = log_jq_prev[stop_row]
        new_log_jp = log_jp_prev[stop_row]

        n = jnp.where(active, n_new, n)
        ind = jnp.where(active, row, ind)
        done = jnp.where(active, full, done)
        resid_row = jnp.where(active, new_resid, resid_row)
        log_jq_seed = jnp.where(active, new_log_jq, log_jq_seed)
        log_jp_seed = jnp.where(active, new_log_jp, log_jp_seed)
        has_seed = jnp.where(active, ~full, has_seed)
        rounds = rounds + active.astype(jnp.int32)
        if return_telemetry:
            # accumulate PER ROUND (ref accumulates per inner step); a round
            # that never ran leaves its row zero
            tel_sbp = tel_sbp.at[b].set(
                jnp.where(active, jnp.where(valid, sbp, 0.0), tel_sbp[b]))
            tel_p = tel_p.at[b].set(jnp.where(active, p_i, tel_p[b]))
            tel_q = tel_q.at[b].set(jnp.where(active, q_i, tel_q[b]))

    # final token: bonus from p[ind, gamma] on full acceptance, otherwise from
    # the normalized residual at the stop position (ref :5551-5579). If the
    # residual mass is zero (p == q on the branch) fall back to the drafted
    # token one-hot, matching the trie variant's guard (EAGLE utils.py:615-621).
    ind_c = jnp.clip(ind, 0, R - 1)
    bonus = p.astype(jnp.float32)[ind_c, gamma]
    onehot = jax.nn.one_hot(
        draft_tokens[ind_c, jnp.clip(n, 0, gamma - 1)], V, dtype=jnp.float32)
    resample = normalize(resid_row, fallback=onehot)
    final_dist = jnp.where(done, bonus, resample)
    t = categorical(jax.random.fold_in(key, 3 * K + 2), final_dist)
    tokens = scatter_commit(jnp.take(draft_tokens, ind_c, axis=0), t, n)
    result = VerifyResult(tokens=tokens, n_matches=n, draft_index=ind, rounds=rounds)
    if return_telemetry:
        return result, Telemetry(tel_sbp, tel_p, tel_q)
    return result
