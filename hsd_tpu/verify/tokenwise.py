"""Tokenwise (Leviathan et al.) verification with multidraft recursive
reject sampling.

Behavioral spec re-derived from the reference's tokenwise branch
(`transformers/generation/utils.py:5660-5780`):

  * per position j: accept draft token x_j iff u_j <= p_j / q_j; stop at the
    first rejection; resample from the normalized residual
    p' = norm(max(p_n - q_n, 0)).
  * multidraft (K > 1, `parallel=True`): drafts are examined in order; draft b
    is usable only if its first n tokens match the accepted prefix
    (utils.py:5672-5677). For b > 0 the restart position's target distribution
    is replaced by the *previous residual* p' (utils.py:5689-5692) — recursive
    rejection sampling across drafts, which is what makes multidraft lossless.

The reference implements this as a Python loop with `.item()` syncs and
dynamic slicing; here it is a fixed-shape, jit-compiled kernel: the K rounds
are unrolled (K is a static config), each round masked by an `active` flag,
and the per-round window [n, gamma) is a clipped gather plus a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import (TINY, Telemetry, VerifyResult, categorical,
                     gather_token_probs, normalize, prefix_matches,
                     scatter_commit, window_index)


def verify_tokenwise(key: jax.Array, draft_tokens: jax.Array, q: jax.Array,
                     p: jax.Array, return_telemetry: bool = False,
                     num_drafts: int = 0, striped: bool = False):
    """Tokenwise verification over K drafts.

    parallel mode (striped=False): K = draft_tokens.shape[0] independent full
    drafts with prefix-match gating. striped mode: rows are laid out
    [primary, then gamma groups of (num_drafts-1) branches, group j branching
    off the primary at position j] and round b examines row
    n_matches*(num_drafts-1)+b with no gate (ref utils.py:5679; the layout is
    produced by `_sample` appending row-0 copies every step, :3369-3378).

    K == 1 reduces exactly to Leviathan et al. algorithm 1.
    """
    R, gamma = draft_tokens.shape
    K = num_drafts if num_drafts else R

    n = jnp.int32(0)
    ind = jnp.int32(0)
    resid = jnp.zeros((p.shape[-1],), p.dtype)  # residual distribution carry
    has_resid = jnp.bool_(False)                # restart row uses `resid`?
    done = jnp.bool_(False)
    rounds = jnp.int32(0)
    tel_sbp = jnp.zeros((K, gamma), jnp.float32)   # one row per round
    tel_p = jnp.zeros((K, gamma), jnp.float32)
    tel_q = jnp.zeros((K, gamma), jnp.float32)

    for b in range(K):
        if striped:
            row = jnp.clip(n * (K - 1) + b, 0, R - 1)
            # Exactness fix (same telescoping argument as the HSD capped
            # frontier, docs/LOSSLESSNESS.md): a striped branch row is only
            # conditioned correctly while the accepted prefix still follows
            # the PRIMARY path — which is exactly the prefix-match gate. The
            # reference omits it (utils.py:5679) and is measurably biased;
            # hsd_ref keeps the ungated reference behavior.
            active = (~done) & prefix_matches(draft_tokens, row, ind, n)
        else:
            row = jnp.int32(b)
            active = (~done) & prefix_matches(draft_tokens, row, ind, n)
        d_row = jnp.take(draft_tokens, row, axis=0)
        q_all = jnp.take(q, row, axis=0)
        p_all = jnp.take(p, row, axis=0)
        idx, valid = window_index(n, gamma)
        x = d_row[idx]
        q_rows = q_all[idx, :]
        q_i = gather_token_probs(q_rows, x)
        p_rows = p_all[idx, :]
        # substitute the restart row with the carried residual (b>0 rounds)
        p_rows = p_rows.at[0].set(jnp.where(has_resid, resid, p_rows[0]))
        p_i = p_rows[jnp.arange(gamma), x]
        q_i = jnp.where(valid, q_i, 1.0)
        p_i = jnp.where(valid, p_i, 1.0)

        u = jax.random.uniform(jax.random.fold_in(key, 2 * b), (gamma,))
        accepted = (u <= p_i / jnp.maximum(q_i, TINY)) & valid
        csm = jnp.sum(jnp.cumprod(accepted.astype(jnp.int32)))
        n_new = n + csm
        full = n_new == gamma

        # residual at the rejection position (recursive reseed for next round,
        # utils.py:5718-5727); bonus distribution if fully accepted.
        rej_p = p_rows[jnp.clip(csm, 0, gamma - 1)]
        rej_q = q_all[jnp.clip(n_new, 0, gamma - 1)]
        new_resid = normalize(jnp.maximum(rej_p - rej_q, 0.0), fallback=rej_p)
        new_resid = jnp.where(full, p_all[gamma], new_resid)

        # fold this round into the carry only where active
        n = jnp.where(active, n_new, n)
        ind = jnp.where(active, row, ind)
        resid = jnp.where(active, new_resid, resid)
        has_resid = jnp.where(active, ~full, has_resid)
        done = jnp.where(active, full, done)
        rounds = rounds + active.astype(jnp.int32)
        if return_telemetry:
            # accumulate PER ROUND (ref accumulates per inner step)
            tel_sbp = tel_sbp.at[b].set(jnp.where(
                active, 1.0 - jnp.minimum(p_i / jnp.maximum(q_i, TINY), 1.0),
                tel_sbp[b]))
            tel_p = tel_p.at[b].set(
                jnp.where(active, p_i.astype(jnp.float32), tel_p[b]))
            tel_q = tel_q.at[b].set(
                jnp.where(active, q_i.astype(jnp.float32), tel_q[b]))

    # final token: bonus p[ind, gamma] when fully accepted (already folded into
    # `resid`), otherwise the carried normalized residual.
    t = categorical(jax.random.fold_in(key, 2 * K + 1), resid)
    tokens = scatter_commit(jnp.take(draft_tokens, jnp.clip(ind, 0, R - 1),
                                     axis=0), t, n)
    result = VerifyResult(tokens=tokens, n_matches=n, draft_index=ind, rounds=rounds)
    if return_telemetry:
        return result, Telemetry(tel_sbp, tel_p, tel_q)
    return result
