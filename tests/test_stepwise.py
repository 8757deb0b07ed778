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
        out, n_commit, _, _ = recursive_round(k, x, q, p, jnp.int32(0),
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
    # telemetry: per-block accepted drafted tokens within [0, gamma] (the
    # sum of accepted drafted tokens per block is at most gamma), and the
    # drafted-count denominator is the REAL drafted total (>= gamma: round 0
    # drafts the full budget, re-draft rounds add gamma - hist each)
    acc = np.asarray(res.accepts)[: int(res.blocks)]
    assert ((acc >= 0) & (acc <= 3)).all()
    dl = np.asarray(res.draft_lens)[: int(res.blocks)]
    assert (dl >= 3).all(), dl
    assert (acc <= dl).all()


def test_recursive_round_hist_differential():
    """hist>0 differential test: the law of recursive_round on a 2-round
    trajectory (history p-rows = round-1 residuals, per the reference's
    docstring recursion, utils.py:5259-5277) must match an independent
    numpy enumeration of the same spec."""
    from hsd_tpu.verify import recursive_round

    V, gamma, hist = 6, 3, 1
    rng = np.random.default_rng(11)
    q = rng.dirichlet(np.ones(V), size=gamma).astype(np.float32)
    # history p-row = a residual-like row (sparse support, as a real round-1
    # residual would be); tail rows = fresh target rows
    p = np.zeros((gamma + 1, V), np.float32)
    resid0 = np.maximum(rng.normal(size=V), 0) * (rng.random(V) > 0.5)
    resid0[0] += 0.3  # ensure nonzero
    p[0] = resid0 / resid0.sum()
    p[1:] = rng.dirichlet(np.ones(V), size=gamma).astype(np.float32)
    x = np.array([int(rng.integers(V)) for _ in range(gamma)], np.int32)

    # --- independent numpy enumeration of the round's law ----------------
    q_i = q[np.arange(gamma), x]
    p_i = p[np.arange(gamma), x]
    jq_prev = np.concatenate([[1.0], np.cumprod(q_i)[:-1]])
    jp_prev = np.concatenate([[1.0], np.cumprod(p_i)[:-1]])
    r = jp_prev / jq_prev
    diffs = r[:, None] * p[:gamma] - q
    plus = np.maximum(diffs, 0)
    s_plus, s_minus = plus.sum(1), np.maximum(-diffs, 0).sum(1)
    denom = np.maximum(s_plus, s_minus)
    sbp = np.where(denom > 0, 1 - s_plus / np.maximum(denom, 1e-30), 0.0)
    resid = np.where(s_plus[:, None] > 0,
                     plus / np.maximum(s_plus, 1e-30)[:, None], 0.0)
    f = min(1.0, float(np.prod(p_i / q_i)))          # frontier accept prob
    # tail positions 1, 2: stop = 2 iff pos 2 does not step back, else 1
    law = {}  # (n_commit, last_token) -> prob

    def add(n, tok, pr):
        law[(n, tok)] = law.get((n, tok), 0.0) + pr

    for t in range(V):                                # full: x1 x2 + bonus t
        add(3, t, f * p[gamma, t])
    d2 = resid[2] if resid[2].sum() > 0 else np.eye(V)[x[2]]
    for t in range(V):                                # stop=2: x1 + resample
        add(2, t, (1 - f) * (1 - sbp[2]) * d2[t])
    d1 = resid[1] if resid[1].sum() > 0 else np.eye(V)[x[1]]
    for t in range(V):                                # stop=1: resample only
        add(1, t, (1 - f) * sbp[2] * d1[t])

    # --- Monte Carlo over the jax implementation --------------------------
    n = 30000
    keys = jax.random.split(jax.random.PRNGKey(12), n)

    def run(k):
        out, n_commit, _, _ = recursive_round(
            k, jnp.asarray(x), jnp.asarray(q), jnp.asarray(p),
            jnp.int32(hist), jnp.int32(gamma))
        last = out[jnp.clip(n_commit - 1, 0, gamma)]
        return n_commit, last

    nc, last = jax.vmap(run)(keys)
    nc, last = np.asarray(nc), np.asarray(last)
    emp = {}
    for a, b in zip(nc, last):
        emp[(int(a), int(b))] = emp.get((int(a), int(b)), 0) + 1 / n
    tv = 0.5 * sum(abs(law.get(kk, 0.0) - emp.get(kk, 0.0))
                   for kk in set(law) | set(emp))
    assert tv < 0.02, (tv, sorted(law.items()), sorted(emp.items()))


def test_recursive_engine_resid_substitution():
    """Engine-level: multi-round blocks (max_new > gamma, mismatched models)
    run through the p-row substitution path without degenerate acceptance:
    with a strongly divergent draft the mean accepted-per-block must stay
    well below gamma (the pre-fix raw-p history seeding collapsed to
    near-certain accept-all after any rejection)."""
    from hsd_tpu.engine.stepwise import make_recursive_generate
    pd = init_params(CFG, jax.random.PRNGKey(5))
    pt = init_params(CFG, jax.random.PRNGKey(6))
    # sharpen the target to maximize draft/target divergence
    pt = pt._replace(embed=pt.embed * 3.0)
    eng = EngineConfig(verifier=VerifierConfig(method="hsd_ref", gamma=4),
                       max_new_tokens=24)
    gen = make_recursive_generate(CFG, CFG, eng)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    res = jax.vmap(lambda k: gen(pd, pt, prompt, jnp.int32(8), k))(
        jax.random.split(jax.random.PRNGKey(13), 32))
    accs, dls = [], []
    for i in range(32):
        b = int(res.blocks[i])
        accs.extend(np.asarray(res.accepts[i])[:b].tolist())
        dls.extend(np.asarray(res.draft_lens[i])[:b].tolist())
    accs, dls = np.array(accs), np.array(dls)
    assert ((accs >= 0) & (accs <= 4)).all()
    assert (dls >= 4).all() and (accs <= dls).all()
    # divergent models: acceptance rate must be far from the accept-all
    # collapse (rate ~1.0) the unseeded history produced
    assert accs.sum() / dls.sum() < 0.8, accs.sum() / dls.sum()


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


def test_recursive_round_truncated_q_history_accept_all():
    """Pin the documented truncating-processor edge (docs/PARITY.md T1b
    note): when a committed HISTORY token has q_i == 0 (a top-k/top-p draft
    processor zeroed it, but the residual resample committed it anyway), the
    raw frontier ratio prod(p_i/q_i) blows up to +inf and the round becomes
    accept-all — inherent to the reference's raw-frontier recursion, NOT a
    deviation. The implementation must stay finite (no NaNs) and commit the
    full tail + bonus with probability 1."""
    from hsd_tpu.verify import recursive_round

    V, gamma, hist = 6, 3, 1
    rng = np.random.default_rng(21)
    q = rng.dirichlet(np.ones(V), size=gamma).astype(np.float32)
    q[0, 2] = 0.0                       # truncated: committed token has q=0
    q[0] /= q[0].sum()
    p = rng.dirichlet(np.ones(V), size=gamma + 1).astype(np.float32)
    x = np.array([2, 1, 4], np.int32)   # history token = the zeroed one

    n = 300
    keys = jax.random.split(jax.random.PRNGKey(22), n)

    def run(k):
        out, n_commit, full, resid = recursive_round(
            k, jnp.asarray(x), jnp.asarray(q), jnp.asarray(p),
            jnp.int32(hist), jnp.int32(gamma))
        return out, n_commit, full, resid

    out, nc, full, resid = jax.vmap(run)(keys)
    assert np.isfinite(np.asarray(resid)).all()
    # +inf frontier => accept-all every time: full tail (gamma - hist = 2
    # drafted tokens) + bonus
    assert np.asarray(full).all()
    assert (np.asarray(nc) == gamma - hist + 1).all()
    # committed tail tokens are the drafted ones; bonus is p[gamma]-distributed
    assert (np.asarray(out)[:, 0] == 1).all()
    assert (np.asarray(out)[:, 1] == 4).all()
    bonus = np.asarray(out)[:, 2]
    emp = np.bincount(bonus, minlength=V) / n
    tv = 0.5 * np.abs(emp - p[gamma]).sum()
    assert tv < 0.12, tv


def test_recursive_engine_truncating_processor_runs():
    """Engine-level twin of the +inf-frontier pin: a top-k-truncating draft
    processor must not break the recursive engine (finite outputs, valid
    tokens, telemetry invariants hold) even though history q-zeros force
    accept-all rounds."""
    from hsd_tpu.engine.stepwise import make_recursive_generate
    pd = init_params(CFG, jax.random.PRNGKey(5))
    pt = init_params(CFG, jax.random.PRNGKey(6))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd_ref", gamma=3),
                       max_new_tokens=12, top_k=4)   # truncating draft+target
    gen = make_recursive_generate(CFG, CFG, eng)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    res = jax.vmap(lambda k: gen(pd, pt, prompt, jnp.int32(8), k))(
        jax.random.split(jax.random.PRNGKey(23), 16))
    for i in range(16):
        n = int(res.length[i])
        toks = np.asarray(res.tokens[i])[8:n]
        assert ((toks >= 0) & (toks < 32)).all()
        assert 1 <= int(res.ncommit[i]) <= 12
        b = int(res.blocks[i])
        acc = np.asarray(res.accepts[i])[:b]
        dl = np.asarray(res.draft_lens[i])[:b]
        assert ((acc >= 0) & (acc <= dl)).all()
