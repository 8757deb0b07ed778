"""End-to-end engine tests on tiny random-weight models.

Key invariants:
  * greedy speculative decoding == greedy autoregressive decoding of the
    target, token for token, for ANY draft model — this exercises prefill,
    RoPE positions, left-pad masking, KV append/rollback and commit logic
    (any cache inconsistency shifts a logit and breaks exact equality);
  * draft == target => every block fully accepted;
  * the engine respects max_new_tokens and EOS truncation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import make_autoregressive, make_generate
from hsd_tpu.models import init_params

CFG = ModelConfig.tiny(vocab_size=64)
PD = init_params(CFG, jax.random.PRNGKey(0))
PT = init_params(CFG, jax.random.PRNGKey(1))
PROMPT = (jnp.arange(10, dtype=jnp.int32) % 50) + 1
PLEN = jnp.int32(7)


def _spec(method, K, temp, max_new=24, gamma=4):
    eng = EngineConfig(
        verifier=VerifierConfig(method=method, gamma=gamma, num_drafts=K),
        max_new_tokens=max_new, temperature=temp)
    return make_generate(CFG, CFG, eng)


def test_greedy_spec_equals_greedy_ar():
    gen = _spec("greedy", 1, 0.0)
    res = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(2))
    ar = make_autoregressive(CFG, EngineConfig(max_new_tokens=24, temperature=0.0))
    t_ar, l_ar = ar(PT, PROMPT, PLEN, jax.random.PRNGKey(3))
    n = min(int(res.length), int(l_ar))
    got = np.asarray(res.tokens)[10:n]
    want = np.asarray(t_ar)[10:n]
    np.testing.assert_array_equal(got, want)
    assert int(res.ncommit) == 24 or res.tokens[res.length - 1] == CFG.eos_token_id


@pytest.mark.parametrize("method,K", [("tokenwise", 1), ("hsd", 1), ("hsd", 3)])
def test_same_model_full_acceptance(method, K):
    gen = _spec(method, K, 1.0)
    res = gen(PT, PT, PROMPT, PLEN, jax.random.PRNGKey(5))
    acc = np.asarray(res.accepts)[:int(res.blocks)]
    # p == q: only numerical noise between the batched target forward and the
    # single-token draft forwards can cause a rejection
    assert acc.mean() >= 3.8, acc


@pytest.mark.parametrize("method,K", [("tokenwise", 1), ("tokenwise", 2),
                                      ("hsd", 1), ("hsd", 2), ("blockwise", 1)])
def test_spec_generates_and_respects_budget(method, K):
    gen = _spec(method, K, 1.0, max_new=16)
    res = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(7))
    assert 1 <= int(res.ncommit) <= 16 + 4  # gamma slack on final block
    toks = np.asarray(res.tokens)[10:int(res.length)]
    assert (toks >= 0).all() and (toks < CFG.vocab_size).all()
    acc = np.asarray(res.accepts)[:int(res.blocks)]
    assert ((acc >= 0) & (acc <= 4)).all()


@pytest.mark.parametrize("method", ["tokenwise", "hsd"])
def test_striped_tree_engine(method):
    """Striped-tree multidraft layout through the full engine."""
    eng = EngineConfig(
        verifier=VerifierConfig(method=method, gamma=3, num_drafts=3,
                                parallel=False),
        max_new_tokens=10)
    gen = make_generate(CFG, CFG, eng)
    res = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(11))
    assert 1 <= int(res.ncommit) <= 13
    toks = np.asarray(res.tokens)[10:int(res.length)]
    assert ((toks >= 0) & (toks < CFG.vocab_size)).all()


def test_left_padding_invariance():
    """The same prompt in a bigger left-padded bucket must decode greedily to
    the same tokens (pad slots are fully dead)."""
    gen = _spec("greedy", 1, 0.0, max_new=12)
    res1 = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(2))
    bigger = jnp.concatenate([jnp.zeros((6,), jnp.int32), PROMPT])
    res2 = gen(PD, PT, bigger, PLEN, jax.random.PRNGKey(2))
    a = np.asarray(res1.tokens)[10:10 + 12]
    b = np.asarray(res2.tokens)[16:16 + 12]
    np.testing.assert_array_equal(a, b)


def test_bitwise_determinism():
    """Same PRNG key => identical committed stream, across separate calls
    (explicit key threading is what makes losslessness bit-testable,
    SURVEY.md §7)."""
    gen = _spec("hsd", 2, 1.0, max_new=12)
    r1 = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(42))
    r2 = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(42))
    assert int(r1.length) == int(r2.length)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    r3 = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(43))
    assert not np.array_equal(np.asarray(r1.tokens)[:int(r1.length)],
                              np.asarray(r3.tokens)[:int(r3.length)])


def test_fused_params_equivalence():
    """fuse_params (qkv + gate|up fusion) must be numerically identical."""
    from hsd_tpu.engine.kvcache import init_cache
    from hsd_tpu.models import transformer
    fused = transformer.fuse_params(CFG, PT)
    toks = (jnp.arange(6, dtype=jnp.int32) % 50)[None, :] + 1
    c1 = init_cache(CFG, 1, 8)
    c2 = init_cache(CFG, 1, 8)
    l1, _ = transformer.forward(CFG, PT, toks, c1)
    l2, _ = transformer.forward(CFG, fused, toks, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)


def test_packed_int4_draft_engine_e2e():
    """Model-level packed-int4 plumbing: an int4-quantized draft (uint8
    nibble containers, XLA fallback path off-TPU) must decode losslessly —
    greedy spec with ANY draft equals greedy AR of the target."""
    from hsd_tpu.models.transformer import fuse_params
    from hsd_tpu.ops.linear import quantize

    q4 = {}
    for k, v in PD.layers.items():
        if k.startswith("w"):
            q4[k] = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[quantize(v[i], bits=4, group_size=32)
                  for i in range(v.shape[0])])
            assert q4[k].qweight.dtype == jnp.uint8
        else:
            q4[k] = v
    pd4 = fuse_params(CFG, PD._replace(layers=q4))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=4),
                       max_new_tokens=16, temperature=0.0)
    gen = make_generate(CFG, CFG, eng)
    res = gen(pd4, PT, PROMPT, PLEN, jax.random.PRNGKey(3))
    assert int(res.ncommit) >= 1

    ar = make_autoregressive(CFG, eng)
    toks_ar, len_ar = ar(PT, PROMPT, PLEN, jax.random.PRNGKey(4))
    n = int(res.ncommit)
    np.testing.assert_array_equal(
        np.asarray(res.tokens)[10:10 + n],
        np.asarray(toks_ar)[10:10 + n])


def test_top_k_one_equals_greedy_ar():
    """top_k=1 with temperature 1 collapses sampling to argmax everywhere —
    the spec stream must equal greedy AR exactly (threads the logits-
    processor knobs through draft, target and verification)."""
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=4),
                       max_new_tokens=16, temperature=1.0, top_k=1)
    gen = make_generate(CFG, CFG, eng)
    res = gen(PD, PT, PROMPT, PLEN, jax.random.PRNGKey(5))
    eng0 = EngineConfig(verifier=VerifierConfig(method="greedy", gamma=4),
                        max_new_tokens=16, temperature=0.0)
    ar = make_autoregressive(CFG, eng0)
    toks_ar, _ = ar(PT, PROMPT, PLEN, jax.random.PRNGKey(6))
    n = int(res.ncommit)
    assert n >= 1
    np.testing.assert_array_equal(np.asarray(res.tokens)[10:10 + n],
                                  np.asarray(toks_ar)[10:10 + n])
