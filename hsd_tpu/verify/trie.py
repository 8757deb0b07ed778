"""Trie (tree-draft) verification for EAGLE-style drafting.

Re-derived from the reference's `EAGLE-3H/eagle/model/utils.py:338-627`
(`evaluate_posterior`). Candidates are the trie's root->leaf paths: rows
[R, L] of token ids, col 0 = the committed root, -1 padding; `p[r, j]` is the
target distribution AFTER consuming path tokens 0..j of row r (gathered via
retrieve_indices from the tree forward). Draft proposals are deterministic
top-k, so q == 1 per drafted token (one-hot draft distributions).

Three modes, matching the reference:
  * greedy (temperature 0, ref :362-375): longest path matching target argmax;
  * typical (EAGLE default, ref :377-418): per-level sequential rejection over
    the accepted node's children with zero-and-renormalize residuals
    (SpecInfer-style, exactly lossless);
  * trie-HSD (ref :420-627): the hierarchical joint test on paths, with
    min(Jp, Jq) prefix capping, the step-back-zero rule for ratio >= 1, and
    multipath residual reseeding — implemented as one lax.scan over rows
    (no Python loops, no host syncs).

All return (best_row, accept_len, sample_p): accept_len counts accepted
tokens BEYOND the root; the caller commits candidates[best_row, 1:accept_len+1]
and samples the next token from sample_p (ref update_inference_inputs,
:629-684).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import TINY


def _safe_log(x):
    return jnp.where(x > 0, jnp.log(jnp.maximum(x, TINY)), -jnp.inf)


def _paths_view(p, L):
    """Normalize the two accepted `p` layouts into accessors.

    p is either the materialized per-path rows [R, L, V] or the tuple
    (probs [N+1, V], retrieve_indices [R, L]) straight from the engine —
    the tuple form avoids materializing the path gather (R*L*V floats;
    291 MB at production shape, ~8x the node probabilities it duplicates).

    Returns (row(r, j) -> [V] f32, vals(r, idx [L], xc [L]) -> [L] f32, V).
    """
    if isinstance(p, tuple):
        probs, ri = p
        probs = probs.astype(jnp.float32)
        N1 = probs.shape[0]

        def row(r, j):
            return probs[jnp.clip(ri[r, j], 0, N1 - 1)]

        def vals(r, idx, xc):
            nodes = jnp.clip(ri[r][jnp.clip(idx, 0, L - 1)], 0, N1 - 1)
            return probs[nodes, xc]

        return row, vals, probs.shape[-1]
    pf = p.astype(jnp.float32)

    def row(r, j):
        return pf[r, j]

    def vals(r, idx, xc):
        return pf[r][jnp.clip(idx, 0, L - 1), xc]

    return row, vals, pf.shape[-1]


def verify_trie_greedy(candidates: jax.Array, p: jax.Array):
    """Greedy path acceptance (ref :362-375). p may be raw probabilities or
    one-hot; only argmax is used. Accepts the (probs, retrieve_indices)
    tuple layout (_paths_view) — there the argmax runs ONCE per node instead
    of once per (path, level) duplicate."""
    R, L = candidates.shape
    if isinstance(p, tuple):
        probs, ri = p
        N1 = probs.shape[0]
        node_arg = jnp.argmax(probs, axis=-1)          # [N+1]
        tgt = node_arg[jnp.clip(ri, 0, N1 - 1)]        # [R, L]
    else:
        tgt = jnp.argmax(p, axis=-1)                   # [R, L]
    match = (candidates[:, 1:] == tgt[:, :-1]) & (candidates[:, 1:] >= 0)
    acc_len = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    accept_length = jnp.max(acc_len)
    best = jnp.where(accept_length == 0, 0, jnp.argmax(acc_len))
    row, _, _ = _paths_view(p, L)
    sample_p = row(best, accept_length)
    return best.astype(jnp.int32), accept_length.astype(jnp.int32), sample_p


def verify_trie_typical(key: jax.Array, candidates: jax.Array, p: jax.Array):
    """EAGLE's default sampling verification (ref :377-418): at each level,
    try the accepted node's children in row order; accept child x w.p.
    gtp[x]; on rejection zero gtp[x] and renormalize (recursive rejection
    with one-hot q — exactly lossless)."""
    R, L = candidates.shape
    prow, _, V = _paths_view(p, L)

    def level(carry, i):
        acc_len, best, sample_p, adjust, done = carry
        active = (~done) & (i == acc_len)
        # rows whose prefix matches the accepted path
        prefix = candidates[best]                       # [L]
        pos = jnp.arange(L)[None, :]
        is_eq = jnp.all(jnp.where(pos < i[None], candidates == prefix[None],
                                  True), axis=1)
        fi = jnp.argmax(is_eq)                          # first matching row
        gtp0 = prow(fi, i - 1)                          # target dist at level
        # dedup: a token counts only at its first matching row (ref :395-398)
        tok = candidates[:, jnp.clip(i, 0, L - 1)]
        same = (tok[None, :] == tok[:, None])           # [R, R]
        earlier = jnp.tril(jnp.ones((R, R), bool), -1)
        dup = jnp.any(same & earlier & is_eq[None, :], axis=1)
        usable = is_eq & (~dup) & (tok >= 0)

        # Sequential rejection with zero-and-renormalize composes to
        # gtp_cur[x_j] = gtp0[x_j] / (1 - m_j), m_j = mass of previously
        # rejected (distinct, deduped) tokens. The chain also stops at the
        # FIRST acceptance, so every row before it was tried-and-rejected —
        # which makes m_j simply the EXCLUSIVE cumsum of usable token mass.
        # The whole row loop therefore has a closed vectorized form: no scan
        # (R sequential steps x ~7us loop latency was the verify hot cost,
        # scripts/bench_trie_verify.py), no [V] renormalization per row.
        # The residual vector is rebuilt once per level below.
        xc = jnp.clip(tok, 0, V - 1)
        probs0 = gtp0[xc]                               # [R] token masses
        # identical draws to the sequential loop (fold_in per row index)
        u = jax.vmap(lambda j: jax.random.uniform(
            jax.random.fold_in(key, i * R + j)))(jnp.arange(R))
        pu = jnp.where(usable, probs0, 0.0)
        m = jnp.cumsum(pu) - pu                         # exclusive cumsum
        acc_flags = usable & (u <= probs0 / jnp.maximum(1.0 - m, TINY))
        accepted = jnp.any(acc_flags)
        first = jnp.argmax(acc_flags)
        bestj = jnp.where(accepted, first, best)
        # rows tried before the acceptance point were all rejected
        rejf = usable & (jnp.arange(R) < jnp.where(accepted, first, R))
        adj = jnp.any(rejf)
        # one [V] residual rebuild per level: zero every rejected token
        zeroed = jnp.zeros((V,), jnp.float32).at[xc].max(
            rejf.astype(jnp.float32))
        gtp_z = gtp0 * (1.0 - zeroed)
        s = jnp.sum(gtp_z)
        gtp = jnp.where(adj & (s > 0), gtp_z / jnp.maximum(s, TINY),
                        jnp.where(adj, gtp_z, gtp0))

        acc_len = jnp.where(active & accepted, acc_len + 1, acc_len)
        best = jnp.where(active & accepted, bestj, best)
        sample_p = jnp.where(active, gtp, sample_p)
        adjust = jnp.where(active, adj, adjust)
        done = done | (active & (~accepted))
        return (acc_len, best, sample_p, adjust, done), None

    init = (jnp.int32(1), jnp.int32(0), prow(0, 0), jnp.bool_(False),
            jnp.bool_(False))
    (acc_len, best, gtp, adjust, done), _ = jax.lax.scan(
        level, init, jnp.arange(1, L))

    use_resid = adjust & (acc_len != L)
    bonus = prow(best, jnp.clip(acc_len - 1, 0, L - 1))
    sample_p = jnp.where(use_resid, gtp, bonus)
    return best.astype(jnp.int32), (acc_len - 1).astype(jnp.int32), sample_p


def verify_trie_hsd(key: jax.Array, candidates: jax.Array, p: jax.Array,
                    frontier: str = "capped"):
    """Trie-HSD (ref :420-627): hierarchical joint verification over paths.

    One lax.scan round per candidate row with prefix-match gating; q is
    one-hot so all q-side joints stay 1. Scale-free log-space formulation as
    in verify/hsd.py (the reference needs float64; this does not).

    frontier: 'capped' (default) uses the full capped joint INCLUDING the
    carried residual seed — the exact-losslessness rule derived in
    docs/LOSSLESSNESS.md (with q == 1 the cummax cap is inactive, so the rule
    reduces to seed + window product); 'raw' drops the seed like the
    committed reference (EAGLE utils.py:585).
    """
    R, L = candidates.shape
    prow, pvals, V = _paths_view(p, L)
    row_len = jnp.sum((candidates >= 0).astype(jnp.int32), axis=1)  # [R]
    rel = jnp.arange(L)

    def body_fn(st):
        b, n, ind, resid, log_jp_seed, has_seed, done, last_lb = st
        prefix = candidates[ind]
        pos = jnp.arange(L)
        gate = jnp.all(jnp.where(pos < n, candidates[b] == prefix, True))
        Lb = row_len[b]

        def skip(_):
            return n, ind, resid, log_jp_seed, has_seed, done, last_lb

        def heavy(_):
            return _hsd_round(b, n, resid, log_jp_seed, has_seed, Lb)

        out = jax.lax.cond(gate, heavy, skip, None)
        return (b + 1,) + out

    def _hsd_round(b, n, resid, log_jp_seed, has_seed, Lb):
        """One gate-passing verification round (active == True throughout —
        the while/cond wrapper already established ~done & gate)."""

        # window over positions n..Lb-1 (length Lb - n), fixed size L
        idx = jnp.clip(n + rel, 0, L - 1)
        valid = rel < (Lb - n)
        x = candidates[b][idx]
        xc = jnp.clip(x, 0, V - 1)
        # With one-hot q, every per-position quantity the acceptance logic
        # needs is a SCALAR function of p_i = p_row[x]:
        #   s_plus  = r*(1-p_i) + max(r*p_i - e, 0)   (e = 1 valid, 0 pad)
        #   s_minus = max(e - r*p_i, 0)
        # so no [L, V] diff/residual matrices are materialized; only the one
        # residual row the carry keeps (at stop_row) is built below. This
        # cuts trie-HSD traffic by ~L*V per round (V = 152k).
        rs = jnp.sum(resid)
        # p_i: token mass at each window position; position 0 reads the
        # carried residual seed (normalized lazily — scalar, not [V])
        p_i_rows = pvals(b, idx - 1, xc)                    # [L] gathers
        p_i0_seed = jnp.where(rs > 0, resid[xc[0]] / jnp.maximum(rs, TINY),
                              0.0)
        p_i_rows = p_i_rows.at[0].set(
            jnp.where(has_seed, p_i0_seed, p_i_rows[0]))
        p_i = jnp.where(valid, p_i_rows, 1.0)
        log_p_i = jnp.where(valid, _safe_log(p_i), 0.0)

        seed_p = jnp.where(has_seed, log_jp_seed, 0.0)
        log_jp_prev = seed_p + jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(log_p_i)[:-1]])
        # q-side joints are exactly 1 (one-hot proposals, ref :487-493)
        r = jnp.exp(jnp.minimum(log_jp_prev, 0.0))      # min(Jp, Jq)/Jq

        e = valid.astype(jnp.float32)
        rp = r * jnp.where(valid, p_i, 0.0)             # r * p_row[x]
        s_plus = r * (1.0 - jnp.where(valid, p_i, 0.0)) \
            + jnp.maximum(rp - e, 0.0)
        s_minus = jnp.maximum(e - rp, 0.0)
        denom = jnp.maximum(s_plus, s_minus)
        sbp = jnp.where(denom > 0, 1.0 - s_plus / jnp.maximum(denom, TINY),
                        1.0)
        # ref :566 — never step back where the joint ratio already >= 1
        sbp = jnp.where(log_jp_prev >= 0.0, 0.0, sbp)
        sbp = jnp.clip(jnp.where(valid, sbp, 1.0), 0.0, 1.0)

        u = jax.random.uniform(jax.random.fold_in(key, 2 * b), (L,))
        not_sb = u >= sbp
        last = L - 1 - jnp.argmax(not_sb[::-1])
        stop_rel = jnp.where(jnp.any(not_sb), last, 0)

        if frontier == "capped":
            nv = jnp.sum(valid.astype(jnp.int32))
            log_acc = jnp.minimum(log_jp_prev, 0.0) + log_p_i  # q contributes 0
            log_ratio = log_acc[jnp.clip(nv - 1, 0, L - 1)]
        else:
            log_ratio = jnp.sum(log_p_i)
        u2 = jax.random.uniform(jax.random.fold_in(key, 2 * b + 1))
        accept_all = jnp.log(jnp.maximum(u2, TINY)) <= log_ratio
        num_valid = jnp.sum(valid.astype(jnp.int32))
        csm = jnp.where(accept_all, num_valid, stop_rel)
        n_new = n + csm

        # build ONLY the residual row at stop_row:
        #   p_prime = max(r_s * p_row_s - e_s * onehot(x_s), 0) / denom_s
        stop_row = jnp.clip(csm, 0, L - 1)
        p_row_s = prow(b, jnp.clip(idx[stop_row] - 1, 0, L - 1))  # [V]
        row0_s = jnp.where(rs > 0, resid / jnp.maximum(rs, TINY),
                           jnp.zeros((V,)))
        p_row_s = jnp.where(has_seed & (stop_row == 0), row0_s, p_row_s)
        y = r[stop_row] * p_row_s
        y = y.at[xc[stop_row]].add(-e[stop_row])
        d_s = denom[stop_row]
        new_resid = jnp.where(d_s > 0,
                              jnp.maximum(y, 0.0) / jnp.maximum(d_s, TINY),
                              jnp.zeros((V,)))
        new_seed = log_jp_prev[stop_row]

        return (n_new, b, new_resid, new_seed, jnp.bool_(True),
                n_new >= L, Lb)

    def cond_fn(st):
        b, done = st[0], st[6]
        return (b < R) & (~done)

    init = (jnp.int32(0), jnp.int32(1), jnp.int32(0),
            jnp.zeros((V,), jnp.float32), jnp.float32(0.0),
            jnp.bool_(False), jnp.bool_(False), row_len[0])
    # while_loop + cond instead of a scan over all R rows: rounds after
    # full acceptance never run, and gate-failing rows pay only the [L]
    # prefix compare, not the [V] residual build — the R sequential round
    # bodies were the trie-HSD hot cost (scripts/bench_trie_verify.py)
    (_, n, ind, resid, _, _, _, last_lb) = jax.lax.while_loop(
        cond_fn, body_fn, init)

    # final sampling distribution (ref :607-627)
    bonus = prow(ind, jnp.clip(last_lb - 1, 0, L - 1))
    rs = jnp.sum(resid)
    fb_idx = jnp.where(n + 1 < last_lb, jnp.clip(n + 1, 0, L - 1),
                       jnp.clip(n, 0, L - 1))
    fallback = jax.nn.one_hot(jnp.clip(candidates[ind, fb_idx], 0, V - 1), V,
                              dtype=jnp.float32)
    resample = jnp.where(rs > 0, resid / jnp.maximum(rs, TINY), fallback)
    sample_p = jnp.where(n < last_lb, resample, bonus)
    return ind.astype(jnp.int32), (n - 1).astype(jnp.int32), sample_p
