"""Coupled synthetic target (eval/synthetic.py) through the full engine.

The coupled target is the checkpoint-free stand-in for the reference's
trained 0.5B-draft / 14B-target pair (README.md:121-125). These tests pin the
engine-protocol plumbing (composite cache init/rollback/select) on tiny
geometry; bench.py runs the real shapes on the chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import make_autoregressive, make_generate
from hsd_tpu.eval.synthetic import build_coupled_pair, make_coupled_target

CFG_S = ModelConfig.tiny(vocab_size=64)
CFG_B = ModelConfig.tiny(vocab_size=64, hidden_size=32, num_layers=3,
                         num_heads=4, num_kv_heads=2, intermediate_size=128)
PROMPT = (jnp.arange(10, dtype=jnp.int32) % 50) + 1
PLEN = jnp.int32(8)
FWD, CACHE_OPS = make_coupled_target(CFG_S, CFG_B)
DRAFT, TARGET = build_coupled_pair(jax.random.PRNGKey(0), CFG_S, CFG_B,
                                   lam=0.5, logit_scale=1.0, big_bits=8)


def _gen(method, K, temp, max_new=20, gamma=4):
    eng = EngineConfig(
        verifier=VerifierConfig(method=method, gamma=gamma, num_drafts=K),
        max_new_tokens=max_new, temperature=temp)
    return make_generate(CFG_S, CFG_B, eng, target_forward=FWD,
                         target_cache_ops=CACHE_OPS)


def test_greedy_coupled_spec_equals_greedy_ar():
    """Greedy spec over the coupled target == greedy AR of the coupled
    target: exercises composite prefill, rollback and commit exactly."""
    gen = _gen("greedy", 1, 0.0)
    res = gen(DRAFT, TARGET, PROMPT, PLEN, jax.random.PRNGKey(2))
    ar = make_autoregressive(
        CFG_B, EngineConfig(max_new_tokens=20, temperature=0.0),
        model_forward=FWD, cache_init=CACHE_OPS[0])
    t_ar, l_ar = ar(TARGET, PROMPT, PLEN, jax.random.PRNGKey(3))
    n = min(int(res.length), int(l_ar))
    np.testing.assert_array_equal(np.asarray(res.tokens)[10:n],
                                  np.asarray(t_ar)[10:n])


@pytest.mark.parametrize("method,K", [("tokenwise", 1), ("hsd", 1),
                                      ("hsd", 3)])
def test_coupled_spec_runs(method, K):
    gen = _gen(method, K, 1.0)
    res = gen(DRAFT, TARGET, PROMPT, PLEN, jax.random.PRNGKey(5))
    assert 1 <= int(res.ncommit) <= 20 + 4
    toks = np.asarray(res.tokens)[10:int(res.length)]
    assert ((toks >= 0) & (toks < 64)).all()
    acc = np.asarray(res.accepts)[:int(res.blocks)]
    assert ((acc >= 0) & (acc <= 4)).all()


def test_lam_zero_matches_plain_small_target():
    """With lam=0 the coupled target IS the small trunk: the greedy stream
    must match a plain (non-composite) engine run on the small trunk."""
    tgt0 = TARGET._replace(lam=jnp.float32(0.0))
    gen_c = _gen("greedy", 1, 0.0, max_new=12)
    res_c = gen_c(DRAFT, tgt0, PROMPT, PLEN, jax.random.PRNGKey(2))
    eng = EngineConfig(verifier=VerifierConfig(method="greedy", gamma=4),
                       max_new_tokens=12, temperature=0.0)
    gen_p = make_generate(CFG_S, CFG_S, eng)
    res_p = gen_p(DRAFT, TARGET.small, PROMPT, PLEN, jax.random.PRNGKey(2))
    n = min(int(res_c.length), int(res_p.length))
    np.testing.assert_array_equal(np.asarray(res_c.tokens)[10:n],
                                  np.asarray(res_p.tokens)[10:n])


def test_lam_monotone_divergence():
    """Larger lam => more target-only signal => lower acceptance."""
    accs = []
    for lam in (0.0, 2.0):
        gen = _gen("hsd", 1, 1.0, max_new=40)
        res = gen(DRAFT, TARGET._replace(lam=jnp.float32(lam)), PROMPT, PLEN,
                  jax.random.PRNGKey(9))
        acc = np.asarray(res.accepts)[:int(res.blocks)]
        accs.append(acc.mean())
    assert accs[1] < accs[0] + 0.5, accs
