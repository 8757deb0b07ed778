"""Stepwise (non-clever) HSD engine tests."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine.stepwise import make_stepwise_generate
from hsd_tpu.models import init_params

CFG = ModelConfig.tiny(vocab_size=32, num_layers=2, hidden_size=32,
                       intermediate_size=64, num_heads=4, num_kv_heads=2)


def test_stepwise_generates():
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd_ref", gamma=3),
                      max_new_tokens=10)
    gen = make_stepwise_generate(CFG, CFG, eng)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    res = gen(pd, pt, prompt, jnp.int32(8), jax.random.PRNGKey(2))
    assert 1 <= int(res.ncommit) <= 10
    toks = np.asarray(res.tokens)[8:int(res.length)]
    assert ((toks >= 0) & (toks < 32)).all()


def test_stepwise_stream_near_target():
    """Distribution sanity: the stepwise stream's first-token marginal must
    match AR sampling of the target (the outer block's first committed token
    is exact even under hsd_ref — docs/LOSSLESSNESS.md)."""
    from hsd_tpu.engine import make_autoregressive
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd_ref", gamma=3),
                      max_new_tokens=2)
    gen = make_stepwise_generate(CFG, CFG, eng)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    n = 3000
    res = jax.vmap(lambda k: gen(pd, pt, prompt, jnp.int32(8), k))(
        jax.random.split(jax.random.PRNGKey(3), n))
    first = np.asarray(res.tokens)[:, 8]
    emp = np.bincount(first, minlength=32) / n
    ar = make_autoregressive(CFG, eng)
    t_ar, _ = jax.vmap(lambda k: ar(pt, prompt, jnp.int32(8), k))(
        jax.random.split(jax.random.PRNGKey(4), n))
    want = np.bincount(np.asarray(t_ar)[:, 8], minlength=32) / n
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.08, tv
