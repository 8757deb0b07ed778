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


def test_recursive_round_matches_hsd_ref_round():
    """With hist_len=0 over a fresh draft, recursive_round is exactly one
    K=1 round of the committed backward verifier (verify_hsd frontier='raw').
    Compare the empirical laws of (accepted count, first committed token)."""
    from hsd_tpu.verify import recursive_round, verify
    V, gamma = 8, 4
    key = jax.random.PRNGKey(7)
    kq, kp, kx = jax.random.split(key, 3)
    q = jax.nn.softmax(jax.random.normal(kq, (gamma, V)) * 1.3, -1)
    p = jax.nn.softmax(jax.random.normal(kp, (gamma + 1, V)) * 1.3, -1)
    x = jax.random.categorical(kx, jnp.log(q), -1).astype(jnp.int32)

    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(8), n)

    def rec(k):
        out, n_commit, _ = recursive_round(k, x, q, p, jnp.int32(0),
                                           jnp.int32(gamma))
        return n_commit - 1, out[0]

    def ref(k):
        res = verify("hsd_ref", k, x[None], q[None], p[None])
        return res.n_matches, res.tokens[0]

    na, ta = jax.vmap(rec)(keys)
    nb, tb = jax.vmap(ref)(jax.random.split(jax.random.PRNGKey(9), n))
    for a, b, width in ((na, nb, gamma + 1), (ta, tb, V)):
        ha = np.bincount(np.asarray(a), minlength=width) / n
        hb = np.bincount(np.asarray(b), minlength=width) / n
        tv = 0.5 * np.abs(ha - hb).sum()
        assert tv < 0.05, (tv, ha, hb)


def test_recursive_generates():
    from hsd_tpu.engine.stepwise import make_recursive_generate
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd_ref", gamma=3),
                       max_new_tokens=10)
    gen = make_recursive_generate(CFG, CFG, eng)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    res = gen(pd, pt, prompt, jnp.int32(8), jax.random.PRNGKey(2))
    assert 1 <= int(res.ncommit) <= 10
    toks = np.asarray(res.tokens)[8:int(res.length)]
    assert ((toks >= 0) & (toks < 32)).all()
    # telemetry: per-block accepted drafted tokens within [0, gamma]
    acc = np.asarray(res.accepts)[: int(res.blocks)]
    assert ((acc >= 0) & (acc <= 3 + 1)).all()


def test_recursive_first_token_near_target():
    """Round 0 of the recursive block is the committed backward verifier,
    whose FIRST committed token is exactly target-distributed (the same
    property pinned for the stepwise engine above)."""
    from hsd_tpu.engine import make_autoregressive
    from hsd_tpu.engine.stepwise import make_recursive_generate
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd_ref", gamma=3),
                       max_new_tokens=2)
    gen = make_recursive_generate(CFG, CFG, eng)
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
