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


# ---------------------------------------------------------------------------
# Coupled EAGLE construction (VERDICT r2 item 1): the v1 bigram-oracle head
# is EXACT, and the coupled target's acceptance responds to (scale, lam).
# ---------------------------------------------------------------------------

def _tiny_eagle_setup(scale=6.0, lam=0.0):
    import dataclasses

    from hsd_tpu.models.eagle import EagleConfig
    # eos out of range: the synthetic bigram chain would otherwise hit the
    # tiny vocab's eos id and truncate the measurement
    cfg = dataclasses.replace(
        ModelConfig.tiny(vocab_size=128, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=4,
                         num_kv_heads=2), dtype=jnp.float32,
        eos_token_id=128)
    ecfg = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                       num_kv_heads=2, vocab_size=128, draft_vocab_size=128,
                       intermediate_size=64, dtype=jnp.float32,
                       rope_theta=10000.0, top_k=4, depth=3, total_tokens=11,
                       version=1)
    return cfg, ecfg, scale, lam


def test_bigram_head_is_exact_oracle():
    """The constructed v1 head computes out = emb[tok] @ A exactly at absorb
    AND at beam levels (fc zeroed on the feature half, wo/wdown zeroed), so
    head logits == oracle_logits bit-for-bit in fp32."""
    from hsd_tpu.eval.synthetic import (CoupledEagleParams,
                                        build_bigram_eagle_head,
                                        oracle_logits)
    from hsd_tpu.models.eagle import draft_logp, head_forward, init_eagle_kv
    cfg, ecfg, _, _ = _tiny_eagle_setup()
    head = build_bigram_eagle_head(ecfg, jax.random.PRNGKey(0))
    D = ecfg.hidden_size
    cp = CoupledEagleParams(big=None, embed=head.embed, fc_e=head.fc[:D],
                            lm_head=head.lm_head, scale=jnp.float32(1.0),
                            lam=jnp.float32(0.0))
    toks = jnp.asarray([[3, 17, 98, 55]], jnp.int32)
    emb = jnp.take(head.embed, toks, axis=0)
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, D), jnp.float32)
    kv = init_eagle_kv(ecfg, 1, 16)
    pos = jnp.arange(4)[None, :]
    out, _ = head_forward(ecfg, head, emb, feat, kv, pos)
    # out = emb @ A regardless of the (random) features
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(emb @ head.fc[:D]),
                               rtol=1e-5, atol=1e-5)
    logits = draft_logp(ecfg, head, out)
    want = jax.nn.log_softmax(oracle_logits(cp, toks), -1)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["greedy", "typical", "hsd"])
def test_coupled_eagle_e2e_acceptance(mode):
    """End-to-end: the EAGLE engine over the coupled target accepts at a
    rate controlled by the coupling — sharp lam=0 coupling must beat strong
    big-model divergence by a wide margin in every verify mode."""
    from hsd_tpu.engine.eagle_engine import make_eagle_generate
    from hsd_tpu.eval.synthetic import (build_coupled_eagle_pair,
                                        make_coupled_eagle_target)
    cfg, ecfg, _, _ = _tiny_eagle_setup()
    prompt = (jnp.arange(16, dtype=jnp.int32) % 100) + 1

    def run_be(scale, lam):
        head, target = build_coupled_eagle_pair(
            jax.random.PRNGKey(2), cfg, ecfg, scale=scale, lam=lam,
            big_bits=8)
        eng = EngineConfig(max_new_tokens=24, temperature=1.0)
        gen = make_eagle_generate(
            cfg, ecfg, eng, mode=mode,
            target_forward=make_coupled_eagle_target(cfg, (-1,)))
        res = gen(target, head, prompt, jnp.int32(16), jax.random.PRNGKey(3))
        nb = int(res.blocks)
        assert nb >= 1 and int(res.ncommit) >= 1
        return int(res.ncommit) / nb

    be_sharp = run_be(scale=8.0, lam=0.0)
    be_div = run_be(scale=1.0, lam=6.0)
    assert be_sharp > be_div + 0.5, (be_sharp, be_div)
    assert be_sharp > 1.5, be_sharp
