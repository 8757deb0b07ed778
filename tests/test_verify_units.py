"""Unit tests for verifier helpers and structural invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.verify import verify
from hsd_tpu.verify.common import (last_true_index, normalize, prefix_matches,
                                   scatter_commit, window_index)


def test_last_true_index():
    f = lambda a: int(last_true_index(jnp.asarray(a)))
    assert f([False, True, False, True, False]) == 3
    assert f([False, False]) == 0
    assert f([True, False]) == 0
    assert f([True, True, True]) == 2


def test_window_index():
    idx, valid = window_index(jnp.int32(2), 5)
    np.testing.assert_array_equal(np.asarray(idx), [2, 3, 4, 4, 4])
    np.testing.assert_array_equal(np.asarray(valid), [1, 1, 1, 0, 0])


def test_scatter_commit():
    row = jnp.asarray([7, 8, 9], jnp.int32)
    out = scatter_commit(row, jnp.int32(42), jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(out), [7, 8, 42, 0])
    out = scatter_commit(row, jnp.int32(42), jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(out), [42, 0, 0, 0])
    out = scatter_commit(row, jnp.int32(42), jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(out), [7, 8, 9, 42])


def test_prefix_matches():
    d = jnp.asarray([[1, 2, 3], [1, 2, 4], [9, 2, 3]], jnp.int32)
    assert bool(prefix_matches(d, 1, 0, jnp.int32(2)))
    assert not bool(prefix_matches(d, 2, 0, jnp.int32(1)))
    assert bool(prefix_matches(d, 2, 0, jnp.int32(0)))
    assert not bool(prefix_matches(d, 1, 0, jnp.int32(3)))


def test_normalize_zero_mass_fallback():
    z = jnp.zeros((4,))
    fb = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    np.testing.assert_allclose(np.asarray(normalize(z, fb)), np.asarray(fb))


def _problem(key, K=2, gamma=4, V=8):
    kq, kp, kd = jax.random.split(key, 3)
    q = jax.random.dirichlet(kq, jnp.ones((V,)), shape=(K, gamma))
    p = jax.random.dirichlet(kp, jnp.ones((V,)), shape=(K, gamma + 1))
    d = jax.random.randint(kd, (K, gamma), 0, V)
    return d.astype(jnp.int32), q.astype(jnp.float32), p.astype(jnp.float32)


def test_verify_shapes_and_ranges():
    d, q, p = _problem(jax.random.PRNGKey(0))
    K, gamma = d.shape
    for method, k in [("tokenwise", K), ("hsd", K), ("blockwise", 1), ("greedy", 1)]:
        res = verify(method, jax.random.PRNGKey(1), d[:k], q[:k], p[:k])
        assert res.tokens.shape == (gamma + 1,)
        n = int(res.n_matches)
        assert 0 <= n <= gamma
        assert 0 <= int(res.draft_index) < k
        toks = np.asarray(res.tokens)
        # accepted prefix must be the selected draft's tokens
        np.testing.assert_array_equal(toks[:n], np.asarray(d[int(res.draft_index)])[:n])
        assert 0 <= toks[n] < p.shape[-1]


def test_verify_jit_and_vmap():
    """Verifiers must compose with vmap over a request batch."""
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    probs = [_problem(k, K=2) for k in jax.random.split(jax.random.PRNGKey(6), B)]
    d = jnp.stack([x[0] for x in probs])
    q = jnp.stack([x[1] for x in probs])
    p = jnp.stack([x[2] for x in probs])
    out = jax.vmap(lambda k, a, b, c: verify("hsd", k, a, b, c))(keys, d, q, p)
    assert out.tokens.shape == (B, d.shape[2] + 1)
    assert out.n_matches.shape == (B,)


def test_telemetry_channel():
    d, q, p = _problem(jax.random.PRNGKey(9), K=1)
    res, tel = verify("hsd", jax.random.PRNGKey(2), d, q, p, return_telemetry=True)
    gamma = d.shape[1]
    K = d.shape[0]
    # one telemetry row per multidraft round (ref accumulates per inner step)
    assert tel.step_back_probs.shape == (K, gamma)
    sbp = np.asarray(tel.step_back_probs)
    assert ((sbp >= 0) & (sbp <= 1)).all()
    # round 0 always runs: its p_i row is populated (valid positions <= 1.0)
    assert np.asarray(tel.p_i)[0].max() > 0


def test_forward_sampling_step():
    from hsd_tpu.verify.forward_sampling import forward_sampling_step
    V, L = 8, 4
    key = jax.random.PRNGKey(0)
    q = jax.random.dirichlet(key, jnp.ones((V,)), shape=(L,)).astype(jnp.float32)
    p = jax.random.dirichlet(jax.random.PRNGKey(1), jnp.ones((V,)),
                             shape=(L + 1,)).astype(jnp.float32)
    cand = jnp.asarray([1, 2, 3, 0], jnp.int32)
    toks, n = forward_sampling_step(jax.random.PRNGKey(2), cand, q, p,
                                    jnp.int32(3), last_step=True)
    assert toks.shape == (2,)
    assert int(n) in (0, 1)
    assert 0 <= int(toks[0]) < V
    # identical p == q at the frontier position: resample must return a
    # near-p distributed token; smoke the no-accept path
    toks2, n2 = forward_sampling_step(jax.random.PRNGKey(3), cand, q, p,
                                      jnp.int32(3), last_step=False)
    assert int(n2) == 0
