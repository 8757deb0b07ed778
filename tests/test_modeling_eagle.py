"""Standalone Eagle class (modeling_eagle.py — ref EAGLE-3H/eagle/
modeling_eagle.py parity): construction, tree-masked forward, generate /
naive_generate, and the standalone evaluate_posterior dispatch."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import ModelConfig
from hsd_tpu.modeling_eagle import Eagle, evaluate_posterior
from hsd_tpu.models import init_params, transformer
from hsd_tpu.models.eagle import EagleConfig, init_eagle_params
from hsd_tpu.engine.kvcache import init_cache

TCFG = ModelConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=3, num_heads=4, num_kv_heads=2)
ECFG = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                   num_kv_heads=2, vocab_size=64, draft_vocab_size=64,
                   intermediate_size=64, top_k=3, depth=2, total_tokens=5,
                   dtype=jnp.float32, rope_theta=10000.0)


@pytest.fixture(scope="module")
def eagle():
    pt = init_params(dataclasses.replace(TCFG, dtype=jnp.float32),
                     jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    return Eagle(dataclasses.replace(TCFG, dtype=jnp.float32), pt, ECFG, pe)


def test_generate_and_naive(eagle):
    prompt = np.arange(1, 9) % 50 + 1
    res = eagle.generate(prompt, max_new_tokens=8, key=jax.random.PRNGKey(3))
    assert int(res.ncommit) >= 1
    toks = np.asarray(res.tokens)[: int(res.length)]
    np.testing.assert_array_equal(toks[:8], prompt)

    out, length = eagle.naive_generate(prompt, max_new_tokens=8,
                                       key=jax.random.PRNGKey(4))
    assert int(length) > 8
    # closure caching: second call reuses the jitted engine
    res2 = eagle.generate(prompt, max_new_tokens=8, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(res2.tokens), np.asarray(res.tokens))
    assert len(eagle._gen_cache) == 2


def test_forward_with_tree_mask_matches_causal(eagle):
    """A lower-triangular tree mask must reproduce the plain causal forward."""
    toks = (jnp.arange(6, dtype=jnp.int32) % 50 + 1)[None, :]
    tri = jnp.tril(jnp.ones((6, 6), bool))
    lg_tree, _ = eagle.forward_with_tree_mask(toks, tree_mask=tri)
    cache = init_cache(eagle.cfg_target, 1, 6)
    lg_ref, _ = transformer.forward(eagle.cfg_target, eagle.params_target,
                                    toks, cache)
    np.testing.assert_allclose(np.asarray(lg_tree), np.asarray(lg_ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_with_tree_mask_blocks_nonancestors(eagle):
    """Sibling leaves must see only root+self: swapping the OTHER sibling's
    token must not change a leaf's logits."""
    toks_a = jnp.asarray([[5, 7, 9]], jnp.int32)   # root + two siblings
    toks_b = jnp.asarray([[5, 8, 9]], jnp.int32)   # other sibling differs
    mask = jnp.asarray([[1, 0, 0], [1, 1, 0], [1, 0, 1]], bool)
    pos = jnp.asarray([[0, 1, 1]], jnp.int32)
    la, _ = eagle.forward_with_tree_mask(toks_a, tree_mask=mask, positions=pos)
    lb, _ = eagle.forward_with_tree_mask(toks_b, tree_mask=mask, positions=pos)
    np.testing.assert_allclose(np.asarray(la[0, 2]), np.asarray(lb[0, 2]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(la[0, 1]), np.asarray(lb[0, 1]))


def test_evaluate_posterior_dispatch():
    key = jax.random.PRNGKey(0)
    cand = jnp.asarray([[3, 1, -1], [3, 2, 4]], jnp.int32)
    p = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8)), -1)
    for mode in ("greedy", "typical", "hsd"):
        best, acc, sp = evaluate_posterior(key, cand, p, mode=mode)
        assert 0 <= int(best) < 2
        assert 0 <= int(acc) <= 2
        np.testing.assert_allclose(float(jnp.sum(sp)), 1.0, atol=1e-4)
    with pytest.raises(ValueError):
        evaluate_posterior(key, cand, p, mode="nope")
