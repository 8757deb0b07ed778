"""EAGLE trie drafting + tree verification + engine tests (tiny models)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.engine.eagle_engine import make_eagle_generate
from hsd_tpu.models import init_params
from hsd_tpu.models.eagle import (EagleConfig, build_trie, init_eagle_kv,
                                  init_eagle_params)
from hsd_tpu.verify.trie import (verify_trie_greedy, verify_trie_hsd,
                                 verify_trie_typical)

TCFG = ModelConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=4, num_heads=4, num_kv_heads=2)
ECFG = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                   num_kv_heads=2, vocab_size=64, draft_vocab_size=64,
                   intermediate_size=64, top_k=4, depth=3, total_tokens=11,
                   dtype=jnp.float32, rope_theta=10000.0)


@pytest.fixture(scope="module")
def models():
    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    return pt, pe


def _mk_trie(models, seed=0):
    pt, pe = models
    T = 6
    feats = jax.random.normal(jax.random.PRNGKey(seed), (1, T, 3 * 32))
    toks = jax.random.randint(jax.random.PRNGKey(seed + 1), (1, T), 0, 64)
    kv = init_eagle_kv(ECFG, 1, 64)
    trie, kv2 = build_trie(ECFG, pe, feats, toks.astype(jnp.int32), kv,
                           jnp.int32(0), jnp.int32(7))
    return trie


def test_trie_structure(models):
    trie = _mk_trie(models)
    N = ECFG.total_tokens
    tm = np.asarray(trie.tree_mask)
    par = np.asarray(trie.parents)
    pos = np.asarray(trie.position_ids)
    assert tm.shape == (N + 1, N + 1)
    assert par[0] == -1 and pos[0] == 0
    # every non-root node: parent is an earlier node, mask = parent mask + self
    for i in range(1, N + 1):
        p = par[i]
        assert 0 <= p < i, (i, p)
        want = tm[p].copy()
        want[i] = True
        np.testing.assert_array_equal(tm[i], want)
        assert pos[i] == pos[p] + 1
    # root token propagated
    assert int(trie.draft_tokens[0]) == 7


def test_trie_paths(models):
    trie = _mk_trie(models)
    N = ECFG.total_tokens
    ri = np.asarray(trie.retrieve_indices)
    par = np.asarray(trie.parents)
    npaths = int(trie.num_paths)
    assert 1 <= npaths <= N + 1
    for r in range(npaths):
        row = ri[r]
        valid = row[row >= 0]
        assert valid[0] == 0  # root first
        for a, b in zip(valid[:-1], valid[1:]):
            assert par[b] == a  # consecutive parent links
    # rows beyond npaths are padding
    assert (ri[npaths:] == -1).all()


def _paths_problem(key, R=5, L=4, V=16):
    """Synthetic candidate paths sharing a root, with target prob rows."""
    kc, kp = jax.random.split(key)
    cand = jax.random.randint(kc, (R, L), 0, V).astype(jnp.int32)
    cand = cand.at[:, 0].set(3)
    p = jax.random.dirichlet(kp, jnp.ones((V,)), shape=(R, L)).astype(jnp.float32)
    return cand, p


def test_trie_greedy_verifier():
    cand, p = _paths_problem(jax.random.PRNGKey(2))
    # force row 2 to match argmax for 2 steps
    am = jnp.argmax(p, -1)
    cand = cand.at[2, 1].set(am[2, 0]).at[2, 2].set(am[2, 1])
    best, acc, sp = verify_trie_greedy(cand, p)
    assert int(acc) >= 2
    assert int(best) == 2 or int(cand[best, 1]) == int(am[best, 0])


@pytest.mark.parametrize("fn", [verify_trie_typical, verify_trie_hsd])
def test_trie_verifier_contract(fn):
    cand, p = _paths_problem(jax.random.PRNGKey(3))
    best, acc, sp = fn(jax.random.PRNGKey(4), cand, p)
    R, L = cand.shape
    assert 0 <= int(best) < R
    assert 0 <= int(acc) <= L - 1
    s = float(jnp.sum(sp))
    assert 0.99 < s < 1.01, s
    assert bool((sp >= 0).all())


def test_trie_verifiers_full_match_accept_all():
    """p rows that put all mass on the drafted tokens => full acceptance."""
    V, L = 16, 4
    cand = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    p = jax.nn.one_hot(jnp.asarray([[5, 7, 9, 11]]), V, dtype=jnp.float32)
    for fn in (verify_trie_typical, verify_trie_hsd):
        best, acc, sp = fn(jax.random.PRNGKey(0), cand, p)
        assert int(acc) == L - 1, fn.__name__
        assert int(jnp.argmax(sp)) == 11  # bonus dist = row after last token


def test_eagle_greedy_equals_ar_greedy(models):
    """Greedy EAGLE decoding must reproduce the target's greedy chain exactly
    (accepted trie prefix = argmax chain; mismatch position resampled from the
    target argmax) — exercises trie build, tree-masked forward, path gather,
    KV compaction, and the feature ring buffer."""
    pt, pe = models
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    eng = EngineConfig(max_new_tokens=12, temperature=0.0)
    gen = make_eagle_generate(TCFG, ECFG, eng, mode="greedy")
    res = gen(pt, pe, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    ar = make_autoregressive(TCFG, eng)
    t_ar, l_ar = ar(pt, prompt, jnp.int32(8), jax.random.PRNGKey(6))
    n = min(int(res.length), int(l_ar))
    np.testing.assert_array_equal(np.asarray(res.tokens)[8:n],
                                  np.asarray(t_ar)[8:n])


def test_eagle_quantized_head_greedy_equals_ar(models):
    """int8-quantizing the draft head (models/eagle.quantize_eagle_params)
    changes PROPOSALS only — greedy EAGLE must still reproduce the target's
    greedy chain exactly (the losslessness-by-construction argument: the
    verifier reconstructs the target law regardless of how proposals were
    made)."""
    from hsd_tpu.models.eagle import quantize_eagle_params
    pt, pe = models
    peq = quantize_eagle_params(pe, bits=8)
    from hsd_tpu.ops.linear import QuantizedLinear
    assert isinstance(peq.lm_head, QuantizedLinear)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    eng = EngineConfig(max_new_tokens=12, temperature=0.0)
    gen = make_eagle_generate(TCFG, ECFG, eng, mode="greedy")
    res = gen(pt, peq, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    ar = make_autoregressive(TCFG, eng)
    t_ar, l_ar = ar(pt, prompt, jnp.int32(8), jax.random.PRNGKey(6))
    n = min(int(res.length), int(l_ar))
    assert n > 8
    np.testing.assert_array_equal(np.asarray(res.tokens)[8:n],
                                  np.asarray(t_ar)[8:n])


@pytest.mark.parametrize("mode", ["typical", "hsd"])
def test_eagle_generate_smoke(models, mode):
    pt, pe = models
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    eng = EngineConfig(max_new_tokens=10, temperature=1.0)
    gen = make_eagle_generate(TCFG, ECFG, eng, mode=mode)
    res = gen(pt, pe, prompt, jnp.int32(8), jax.random.PRNGKey(7))
    assert 1 <= int(res.ncommit) <= 10
    toks = np.asarray(res.tokens)[8:int(res.length)]
    assert ((toks >= 0) & (toks < 64)).all()
    acc = np.asarray(res.accepts)[:int(res.blocks)]
    assert ((acc >= 0) & (acc <= ECFG.depth + 1)).all()


ECFG1 = dataclasses.replace(ECFG, version=1)


def test_eagle_v1_greedy_equals_ar(models):
    """EAGLE-1/2 legacy head mode: greedy must still reproduce the target's
    greedy chain exactly (head quality only affects acceptance, never
    correctness)."""
    from hsd_tpu.models.eagle import init_eagle_params_v1
    pt, _ = models
    pe1 = init_eagle_params_v1(ECFG1, jax.random.PRNGKey(9))
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    eng = EngineConfig(max_new_tokens=10, temperature=0.0)
    gen = make_eagle_generate(TCFG, ECFG1, eng, mode="greedy")
    res = gen(pt, pe1, prompt, jnp.int32(8), jax.random.PRNGKey(10))
    ar = make_autoregressive(TCFG, eng)
    t_ar, l_ar = ar(pt, prompt, jnp.int32(8), jax.random.PRNGKey(11))
    n = min(int(res.length), int(l_ar))
    np.testing.assert_array_equal(np.asarray(res.tokens)[8:n],
                                  np.asarray(t_ar)[8:n])


def test_eagle_v1_sampling_smoke(models):
    from hsd_tpu.models.eagle import init_eagle_params_v1
    pt, _ = models
    pe1 = init_eagle_params_v1(ECFG1, jax.random.PRNGKey(12))
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    eng = EngineConfig(max_new_tokens=8, temperature=1.0)
    gen = make_eagle_generate(TCFG, ECFG1, eng, mode="hsd")
    res = gen(pt, pe1, prompt, jnp.int32(8), jax.random.PRNGKey(13))
    assert 1 <= int(res.ncommit) <= 8


def test_paths_view_tuple_parity():
    """(probs, retrieve_indices) tuple layout == materialized [R, L, V]
    rows, bit-for-bit, for all three trie verifiers on the same keys (the
    engine passes the tuple to avoid the R*L*V path duplicate)."""
    import numpy as np
    rng = np.random.default_rng(3)
    R, L, V, N1 = 12, 5, 33, 16
    probs = jax.nn.softmax(
        jnp.asarray(rng.normal(0, 2, (N1, V)), jnp.float32), -1)
    ri = jnp.asarray(rng.integers(0, N1, (R, L)), jnp.int32)
    lens = rng.integers(2, L + 1, (R,))
    ri = jnp.where(jnp.arange(L)[None] < lens[:, None], ri, -1)
    cand = jnp.where(ri >= 0, jnp.asarray(
        rng.integers(0, V, (R, L)), jnp.int32), -1)
    p_mat = jnp.take(probs, jnp.clip(ri, 0, N1 - 1), axis=0)
    for seed in range(3):
        k = jax.random.PRNGKey(seed)
        for fn in (lambda c, p: verify_trie_greedy(c, p),
                   lambda c, p: verify_trie_typical(k, c, p),
                   lambda c, p: verify_trie_hsd(k, c, p)):
            b1, a1, s1 = fn(cand, p_mat)
            b2, a2, s2 = fn(cand, (probs, ri))
            assert int(b1) == int(b2) and int(a1) == int(a2)
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
