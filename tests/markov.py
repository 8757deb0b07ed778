"""Markov-chain mock engine for distribution-exactness property tests.

Draft and target "models" are first-order Markov conditional tables
q_table/p_table of shape [V, V] (row = previous token, col = next-token
probability). A fully vectorized spec-decode loop (scan over blocks, vmap over
trials) commits tokens through a verifier; losslessness means the first T
committed tokens are distributed exactly like T steps of autoregressive
sampling from p_table.

This is the test pyramid's foundation (SURVEY.md §4): the reference "tests"
losslessness only via end-to-end GSM8K accuracy parity; here it is a direct
statistical property of the acceptance kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hsd_tpu.verify import verify


def _draft_one(key, q_table, last, gamma):
    """Sample one gamma-token draft row from the Markov draft model."""

    def step(prev, k):
        tok = jax.random.categorical(k, jnp.log(q_table[prev]))
        return tok, tok

    _, toks = jax.lax.scan(step, last, jax.random.split(key, gamma))
    return toks.astype(jnp.int32)


def _draft_striped(key, q_table, last, gamma, K):
    """Striped-tree draft rows: primary + (K-1) branches per position."""
    R = 1 + gamma * (K - 1)
    act = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.repeat(jnp.arange(gamma, dtype=jnp.int32),
                                      K - 1)])

    def step(prevs, inp):
        j, k = inp
        toks = jax.vmap(lambda kk, pr: jax.random.categorical(kk, jnp.log(pr)))(
            jax.random.split(k, R), q_table[prevs]).astype(jnp.int32)
        toks = jnp.where(act > j, toks[0], toks)
        return toks, toks

    init = jnp.full((R,), last, jnp.int32)
    _, toks = jax.lax.scan(step, init,
                           (jnp.arange(gamma), jax.random.split(key, gamma)))
    return toks.T  # [R, gamma]


@functools.partial(jax.jit, static_argnames=("method", "K", "gamma", "blocks",
                                             "striped"))
def spec_generate_markov(key, q_table, p_table, s0, *, method, K, gamma,
                         blocks, striped=False):
    """Run `blocks` speculative blocks; return committed token buffer + count.

    Buffer is fixed shape [blocks * (gamma + 1)]; each block commits
    n_matches+1 tokens starting at the carried write offset.
    """
    V = q_table.shape[0]
    buf_len = blocks * (gamma + 1)

    def block(carry, bkey):
        buf, off, last = carry
        kd, kv = jax.random.split(bkey)
        if striped:
            drafts = _draft_striped(kd, q_table, last, gamma, K)
        else:
            drafts = jax.vmap(lambda k: _draft_one(k, q_table, last, gamma))(
                jax.random.split(kd, K))                     # [K, gamma]
        Rr = drafts.shape[0]
        prevs = jnp.concatenate(
            [jnp.full((Rr, 1), last, jnp.int32), drafts], axis=1)
        q = q_table[prevs[:, :gamma]]                        # [R, gamma, V]
        p = p_table[prevs]                                   # [R, gamma+1, V]
        res = verify(method, kv, drafts, q, p, num_drafts=K, striped=striped)
        ncommit = res.n_matches + 1
        # scatter committed tokens into the buffer at offset
        pos = jnp.arange(buf_len)
        src = jnp.take(res.tokens, jnp.clip(pos - off, 0, gamma), axis=0)
        write = (pos >= off) & (pos < off + ncommit)
        buf = jnp.where(write, src, buf)
        last_new = res.tokens[res.n_matches]
        return (buf, off + ncommit, last_new), ncommit

    init = (jnp.zeros((buf_len,), jnp.int32), jnp.int32(0), jnp.int32(s0))
    (buf, count, _), ncommits = jax.lax.scan(
        block, init, jax.random.split(key, blocks))
    return buf, count, ncommits


def ar_joint(p_table, s0, T):
    """Analytic joint distribution of T autoregressive target tokens,
    flattened to shape [V**T]."""
    import numpy as np

    pt = np.asarray(p_table, dtype=np.float64)
    joint = pt[s0]  # [V]
    for _ in range(T - 1):
        joint = np.einsum("...i,ij->...ij", joint, pt)
    return joint.reshape(-1)


def empirical_joint(tokens, V, T):
    """Empirical joint of the first T committed tokens, shape [V**T]."""
    import numpy as np

    toks = np.asarray(tokens)[:, :T]
    flat = np.zeros(len(toks), dtype=np.int64)
    for j in range(T):
        flat = flat * V + toks[:, j]
    counts = np.bincount(flat, minlength=V ** T).astype(np.float64)
    return counts / counts.sum()


def tv_distance(a, b):
    import numpy as np

    return 0.5 * float(np.abs(np.asarray(a) - np.asarray(b)).sum())


def random_tables(key, V, concentration=0.6):
    """Two distinct random Markov tables (Dirichlet rows)."""
    kq, kp = jax.random.split(key)
    q = jax.random.dirichlet(kq, jnp.full((V,), concentration), shape=(V,))
    p = jax.random.dirichlet(kp, jnp.full((V,), concentration), shape=(V,))
    return q.astype(jnp.float32), p.astype(jnp.float32)
