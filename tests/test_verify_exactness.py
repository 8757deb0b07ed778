"""Distribution-exactness (losslessness) property tests for every verifier.

The core claim of the reference (README.md:1-5) is that HSD is *lossless*: the
committed token stream is distributed exactly as target autoregressive
sampling. We verify this directly with Markov mock models: the empirical joint
of the first T committed tokens must match the analytic target joint within
Monte-Carlo tolerance — and must NOT match the draft joint (power check).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from markov import (ar_joint, empirical_joint, random_tables,
                    spec_generate_markov, tv_distance)

V = 5
T = 3
GAMMA = 3
# Fast lane (default): 24k trials with MC-scaled tolerances — keeps every
# iteration under the 4-minute budget. Full-precision lane: `-m slow` runs
# the original 120k-trial versions (test_lossless_full below); CI should run
# `pytest -q` + a nightly `pytest -q -m slow`.
FULL_TRIALS = 120_000
N_TRIALS = int(__import__("os").environ.get("HSD_TRIALS", 24_000))
# MC TV noise scales ~ 1/sqrt(N): widen tolerances accordingly in fast mode
MC_SCALE = max(1.0, (FULL_TRIALS / N_TRIALS) ** 0.5)


def _run(method, K, seed=0, concentration=0.6, n_trials=N_TRIALS,
         striped=False):
    key = jax.random.PRNGKey(seed)
    ktab, krun = jax.random.split(key)
    q_table, p_table = random_tables(ktab, V, concentration)
    s0 = 1
    keys = jax.random.split(krun, n_trials)
    bufs, counts, _ = jax.vmap(
        lambda k: spec_generate_markov(
            k, q_table, p_table, s0, method=method, K=K, gamma=GAMMA,
            blocks=T, striped=striped)
    )(keys)
    assert int(counts.min()) >= T, "each trial must commit at least T tokens"
    emp = empirical_joint(bufs, V, T)
    target = ar_joint(p_table, s0, T)
    draft = ar_joint(q_table, s0, T)
    return emp, target, draft


# Monte-Carlo TV tolerance: E[TV] ~ 0.5*C*sqrt(2p/(pi*N)) ~ 0.008 for
# C=125 cells, N=120k; threshold 4x that (scaled by MC_SCALE in fast mode).
TOL = 0.035 * MC_SCALE
# method='hsd_ref' reproduces the COMMITTED reference algorithm, which is NOT
# exactly lossless (raw-joint frontier test; a float64 transcription of the
# reference torch math shows the same TV plateau — docs/LOSSLESSNESS.md).
# These bands pin reference-level behavior: regressions beyond it still fail.
# method='hsd' (capped frontier) is EXACT and held to the strict tolerance.
# bias plateau (N-independent) + MC noise term (scales with 1/sqrt(N))
TOL_HSD_REF = {1: 0.022 + 0.008 * MC_SCALE, 4: 0.033 + 0.012 * MC_SCALE}


@pytest.mark.parametrize("method,K", [
    ("tokenwise", 1),
    ("tokenwise", 4),
    ("hsd", 1),
    ("hsd", 4),
    ("hsd_ref", 1),
    ("hsd_ref", 4),
    ("blockwise", 1),
])
def test_lossless(method, K):
    emp, target, draft = _run(method, K)
    d_target = tv_distance(emp, target)
    d_draft = tv_distance(emp, draft)
    # power check: target and draft joints are well separated
    assert tv_distance(target, draft) > 0.2
    tol = TOL_HSD_REF[K] if method == "hsd_ref" else TOL
    assert d_target < tol, f"{method} K={K}: TV to target {d_target:.4f}"
    assert d_draft > 0.1, f"{method} K={K}: output looks like the draft dist"


@pytest.mark.slow
@pytest.mark.parametrize("method,K", [
    ("tokenwise", 1),
    ("tokenwise", 4),
    ("hsd", 1),
    ("hsd", 4),
    ("hsd_ref", 1),
    ("hsd_ref", 4),
    ("blockwise", 1),
])
def test_lossless_full(method, K):
    """Full-precision lane: the original 120k-trial exactness bands."""
    emp, target, draft = _run(method, K, n_trials=FULL_TRIALS)
    d_target = tv_distance(emp, target)
    tol = ({1: 0.030, 4: 0.045}[K] if method == "hsd_ref" else 0.035)
    assert tv_distance(target, draft) > 0.2
    assert d_target < tol, f"{method} K={K}: TV to target {d_target:.4f}"
    assert tv_distance(emp, draft) > 0.1


def test_first_token_marginal_exact_all_methods():
    """The first committed token of a block is exactly p-distributed for every
    verifier — including hsd_ref (confirmed by exact enumeration; the
    reference bias only affects later within-block positions,
    docs/LOSSLESSNESS.md)."""
    for method, K in [("tokenwise", 1), ("hsd_ref", 1), ("hsd", 4), ("blockwise", 1)]:
        emp, target, _ = _run(method, K, n_trials=min(N_TRIALS, 60_000))
        e1 = empirical_joint_first(emp)
        t1 = marginal_first(target)
        tol1 = 0.012 * max(1.0, (60_000 / min(N_TRIALS, 60_000)) ** 0.5)
        assert tv_distance(e1, t1) < tol1, (method, K, tv_distance(e1, t1))


def marginal_first(joint):
    import numpy as np
    return np.asarray(joint).reshape(V, -1).sum(axis=1)


def empirical_joint_first(joint):
    import numpy as np
    return np.asarray(joint).reshape(V, -1).sum(axis=1)


@pytest.mark.parametrize("method,tol", [("tokenwise", TOL), ("hsd", TOL),
                                        ("hsd_ref", 0.20)])
def test_striped_tree_multidraft(method, tol):
    """Striped-tree multidraft (parallel=False layout). The reference's
    striped indexing re-uses branch rows conditioned on the PRIMARY path even
    after the accepted prefix has diverged (utils.py:5679 — no prefix gate),
    measured TV ~0.15. Adding the prefix gate (a branch row is valid exactly
    while the accepted prefix still follows the primary) makes the mode
    EXACTLY lossless for tokenwise and capped-frontier hsd
    (docs/LOSSLESSNESS.md); hsd_ref keeps ungated reference behavior."""
    emp, target, draft = _run(method, 3, striped=True)
    d_target = tv_distance(emp, target)
    assert d_target < tol, f"striped {method}: TV {d_target:.4f}"
    assert tv_distance(emp, draft) > tv_distance(emp, target) + 0.05


def test_greedy_matches_argmax_chain():
    key = jax.random.PRNGKey(3)
    q_table, p_table = random_tables(key, V)
    s0 = 0
    buf, count, _ = spec_generate_markov(
        jax.random.PRNGKey(7), q_table, p_table, s0, method="greedy", K=1,
        gamma=GAMMA, blocks=T)
    # greedy target chain
    pt = np.asarray(p_table)
    want, last = [], s0
    for _ in range(T):
        last = int(pt[last].argmax())
        want.append(last)
    got = np.asarray(buf)[:T].tolist()
    assert got == want


def test_identical_models_accept_everything():
    """p == q: every verifier must accept the full draft every block."""
    key = jax.random.PRNGKey(11)
    q_table, _ = random_tables(key, V)
    for method, K in [("tokenwise", 1), ("hsd", 1), ("hsd", 3), ("blockwise", 1)]:
        _, count, ncommits = spec_generate_markov(
            jax.random.PRNGKey(5), q_table, q_table, 0, method=method, K=K,
            gamma=GAMMA, blocks=4)
        assert int(count) == 4 * (GAMMA + 1), (method, K, np.asarray(ncommits))


@pytest.mark.parametrize("method", ["hsd", "hsd_ref"])
def test_hsd_block_efficiency_at_least_tokenwise(method):
    """The paper's headline claim: HSD accepts more tokens in expectation than
    tokenwise verification (README.md:120-125). Checked statistically on a
    Markov pair with moderate divergence. Note the exact 'hsd' lands at
    blockwise-level BE (Sun et al. optimality bounds single-draft block
    rules); 'hsd_ref' exceeds it partly through its acceptance bias
    (docs/LOSSLESSNESS.md)."""
    key = jax.random.PRNGKey(21)
    q_table, p_table = random_tables(key, V, concentration=1.5)
    n = 30_000

    def mean_commit(m):
        keys = jax.random.split(jax.random.PRNGKey(100), n)
        _, counts, _ = jax.vmap(
            lambda k: spec_generate_markov(
                k, q_table, p_table, 0, method=m, K=1, gamma=GAMMA,
                blocks=2)
        )(keys)
        return float(jnp.mean(counts)) / 2.0

    be_tok = mean_commit("tokenwise")
    be_hsd = mean_commit(method)
    assert be_hsd >= be_tok - 0.02, (be_tok, be_hsd)


def test_multidraft_improves_acceptance():
    """More parallel drafts => strictly more expected accepted tokens."""
    key = jax.random.PRNGKey(33)
    q_table, p_table = random_tables(key, V, concentration=1.0)
    n = 30_000

    def mean_commit(method, K):
        keys = jax.random.split(jax.random.PRNGKey(200), n)
        _, counts, _ = jax.vmap(
            lambda k: spec_generate_markov(
                k, q_table, p_table, 0, method=method, K=K, gamma=GAMMA,
                blocks=2)
        )(keys)
        return float(jnp.mean(counts)) / 2.0

    for method in ("tokenwise", "hsd"):
        be1 = mean_commit(method, 1)
        be4 = mean_commit(method, 4)
        assert be4 > be1 + 0.02, (method, be1, be4)
