"""Static choice-tree drafting (EAGLE-1 legacy path, models/choices.py).

Pins: buffer construction semantics vs the reference's generate_tree_buffers
(EAGLE-3H/eagle/model/utils.py:90-208), the runtime tree fill, and the
engine-level done-criterion — static-tree greedy decode == AR greedy.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.engine.eagle_engine import make_eagle_generate
from hsd_tpu.models import init_params
from hsd_tpu.models.choices import (StaticTree, build_static_trie,
                                    build_tree_buffers,
                                    eagle_config_for_tree, mc_sim_7b_63)
from hsd_tpu.models.eagle import EagleConfig, init_eagle_kv, init_eagle_params

TCFG = ModelConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=4, num_heads=4, num_kv_heads=2)
TREE = build_tree_buffers(mc_sim_7b_63)
ECFG = eagle_config_for_tree(
    EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                num_kv_heads=2, vocab_size=64, draft_vocab_size=64,
                intermediate_size=64, dtype=jnp.float32, rope_theta=10000.0),
    TREE)


def test_buffer_construction():
    t = TREE
    assert t.num_nodes == len(mc_sim_7b_63)
    assert t.depth == max(len(c) for c in mc_sim_7b_63)
    assert t.top_k == 4  # max rank 3 in mc_sim_7b_63
    # sorted by (depth, lex)
    lens = [len(c) for c in t.choices]
    assert lens == sorted(lens)
    # closure: every node's mask = parent mask + self; depth = parent + 1
    tm, par, pos = t.tree_mask, t.parents, t.position_ids
    assert par[0] == -1 and pos[0] == 0 and tm[0, 0]
    for i in range(1, t.num_nodes + 1):
        want = tm[par[i]].copy()
        want[i] = True
        np.testing.assert_array_equal(tm[i], want)
        assert pos[i] == pos[par[i]] + 1
        assert tm[i, 0]  # every node attends the root (ref utils.py:115)
    # retrieve rows: root-first, consecutive parent links, lengths match
    for r in range(t.num_paths):
        row = t.retrieve_indices[r]
        valid = row[row >= 0]
        assert valid[0] == 0
        assert len(valid) == t.path_len[r]
        for a, b in zip(valid[:-1], valid[1:]):
            assert par[b] == a
    assert (t.retrieve_indices[t.num_paths:] == -1).all()
    # every leaf appears exactly once as a path end
    ends = sorted(int(t.retrieve_indices[r][t.path_len[r] - 1])
                  for r in range(t.num_paths))
    is_parent = np.zeros(t.num_nodes + 1, bool)
    is_parent[t.parents[1:]] = True
    leaves = [i for i in range(1, t.num_nodes + 1) if not is_parent[i]]
    assert ends == leaves


def test_orphan_choice_rejected():
    with pytest.raises(AssertionError):
        build_tree_buffers([[0], [1, 0]])  # [1] missing


@pytest.fixture(scope="module")
def models():
    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    return pt, pe


def test_static_trie_fill(models):
    """The filled tree: child tokens are the rank-th top-k of their parent's
    expansion, and sibling groups are distinct ranks of the same dist."""
    pt, pe = models
    T = 6
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, T, 3 * 32))
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, T), 0, 64)
    kv = init_eagle_kv(ECFG, 1, 96)
    trie, kv2 = build_static_trie(ECFG, pe, feats, toks.astype(jnp.int32),
                                  kv, jnp.int32(0), jnp.int32(7), TREE)
    assert int(trie.draft_tokens[0]) == 7
    assert int(kv2.length) == T  # stable kv excludes the trie scratch
    # structure buffers are the host constants
    np.testing.assert_array_equal(np.asarray(trie.tree_mask), TREE.tree_mask)
    np.testing.assert_array_equal(np.asarray(trie.position_ids),
                                  TREE.position_ids)
    toks_n = np.asarray(trie.draft_tokens)
    # siblings (same parent) must be distinct tokens (distinct ranks)
    from collections import defaultdict
    kids = defaultdict(list)
    for i in range(1, TREE.num_nodes + 1):
        kids[int(TREE.parents[i])].append(toks_n[i])
    for p, ts in kids.items():
        assert len(set(ts)) == len(ts), (p, ts)


def test_static_tree_greedy_equals_ar(models):
    """Done-criterion: static-tree greedy decode == AR greedy decode of the
    target, token for token (losslessness of the verification is independent
    of the tree source)."""
    pt, pe = models
    eng = EngineConfig(max_new_tokens=20, temperature=0.0)
    gen = make_eagle_generate(TCFG, ECFG, eng, mode="greedy",
                              static_tree=TREE)
    prompt = (jnp.arange(9, dtype=jnp.int32) % 50) + 1
    res = gen(pt, pe, prompt, jnp.int32(9), jax.random.PRNGKey(5))
    ar = make_autoregressive(TCFG, eng)
    t_ar, l_ar = ar(pt, prompt, jnp.int32(9), jax.random.PRNGKey(6))
    n = min(int(res.length), int(l_ar))
    np.testing.assert_array_equal(np.asarray(res.tokens)[9:n],
                                  np.asarray(t_ar)[9:n])
    # a trained-free random head still accepts >= 0; blocks ran
    assert int(res.blocks) >= 1


@pytest.mark.parametrize("mode", ["typical", "hsd"])
def test_static_tree_sampling_modes(models, mode):
    pt, pe = models
    eng = EngineConfig(max_new_tokens=16, temperature=1.0)
    gen = make_eagle_generate(TCFG, ECFG, eng, mode=mode, static_tree=TREE)
    prompt = (jnp.arange(9, dtype=jnp.int32) % 50) + 1
    res = gen(pt, pe, prompt, jnp.int32(9), jax.random.PRNGKey(7))
    assert 1 <= int(res.ncommit) <= 16 + TREE.depth + 2
    toks = np.asarray(res.tokens)[9:int(res.length)]
    assert ((toks >= 0) & (toks < 64)).all()
    acc = np.asarray(res.accepts)[:int(res.blocks)]
    assert ((acc >= 0) & (acc <= TREE.depth + 1)).all()
