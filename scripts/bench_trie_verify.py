#!/usr/bin/env python
"""Trie-verification cost at PRODUCTION shape (VERDICT r1 item 7).

Measures the in-graph per-block cost of verify_trie_{greedy,typical,hsd} at
the EAGLE production geometry — total_tokens=59 (R=60 candidate rows),
depth=6 (Lpath=8), V=151936 — on the real chip, via the ITERS-slope method
(docs/BENCHMARKS.md): chain data-dependent verifier calls inside one jit and
time the slope between a short and a long chain, cancelling dispatch cost.

Context: the dense-window verifier was measured at 0.02 ms/block; a trie
block at 14B geometry costs ~25-30 ms (target forward dominates), so the
verify budget is "a few % of block time" = well under 1 ms.

Env: TRIE_R (60), TRIE_L (8), TRIE_V (151936), TRIE_ITERS (64).
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.verify.trie import (verify_trie_greedy, verify_trie_hsd,
                                 verify_trie_typical)

R = int(os.environ.get("TRIE_R", 60))
L = int(os.environ.get("TRIE_L", 8))
V = int(os.environ.get("TRIE_V", 151936))
ITERS = int(os.environ.get("TRIE_ITERS", 64))


def build_case(key):
    """Random-but-plausible candidates + node probabilities + retrieve map.

    Returns (cand [R, L], probs [R, V], ri [R, L]) — the engine's native
    tuple layout; the materialized [R, L, V] rows are derived from it."""
    k1, k2, k3 = jax.random.split(key, 3)
    cand = jax.random.randint(k1, (R, L), 0, V, dtype=jnp.int32)
    # ragged path lengths like a real trie (root always present)
    lens = jax.random.randint(k2, (R,), 2, L + 1)
    cand = jnp.where(jnp.arange(L)[None, :] < lens[:, None], cand, -1)
    ri = jnp.where(jnp.arange(L)[None, :] < lens[:, None],
                   jax.random.randint(k2, (R, L), 0, R, dtype=jnp.int32), -1)
    logits = jax.random.normal(k3, (R, V), jnp.float32)
    # sharpen so acceptance paths vary (flat random would reject instantly)
    probs = jax.nn.softmax(4.0 * logits, -1)
    return cand, probs, ri


def make_chain(mode):
    def one(key, cand, p):
        if mode == "greedy":
            best, acc, sp = verify_trie_greedy(cand, p)
        elif mode == "typical":
            best, acc, sp = verify_trie_typical(key, cand, p)
        else:
            best, acc, sp = verify_trie_hsd(key, cand, p)
        return best, acc, sp

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(key, cand, p, n):
        # no per-iteration tensor perturbation: within ONE jitted fori_loop
        # each iteration already differs (fold_in(key, i)) and iterations
        # chain through acc_sum, so nothing can be elided or merged. (An
        # earlier version renormalized the full [R, L, V] p per iteration —
        # 580 MB/iter of artificial traffic that dominated the slope.)
        def body(i, carry):
            acc_sum, feedback = carry
            k = jax.random.fold_in(key, i + feedback)
            best, acc, sp = one(k, cand, p)
            return (acc_sum + acc, best * 0)
        out = jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))
        return out[0]

    return chain


def slope(mode, cand, p, iters=ITERS):
    chain = make_chain(mode)
    lo, hi = max(4, iters // 4), iters
    seed = [0]

    def timed(n):
        seed[0] += 1
        k = jax.random.PRNGKey(seed[0])
        t0 = time.perf_counter()
        r = np.asarray(chain(k, cand, p, n))
        assert r >= 0
        return time.perf_counter() - t0

    timed(lo); timed(hi)                       # compile
    t_lo = min(timed(lo) for _ in range(3))
    t_hi = min(timed(hi) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), flush=True)
    cand, probs, ri = build_case(jax.random.PRNGKey(0))
    p_mat = jnp.take(probs, jnp.clip(ri, 0, R - 1), axis=0)
    jax.block_until_ready(p_mat)
    out = {"shape": {"R": R, "L": L, "V": V}}
    for mode in ("greedy", "typical", "hsd"):
        ms = slope(mode, cand, (probs, ri)) * 1e3
        out[f"{mode}_ms_per_block"] = round(ms, 4)
        print(f"{mode:8s} {ms:8.3f} ms/block (tuple layout)", flush=True)
    if int(os.environ.get("TRIE_MATERIALIZED", "0")):
        for mode in ("typical", "hsd"):
            ms = slope(mode, cand, p_mat) * 1e3
            out[f"{mode}_ms_per_block_mat"] = round(ms, 4)
            print(f"{mode:8s} {ms:8.3f} ms/block (materialized)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
