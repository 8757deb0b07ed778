"""Prompt-lookup drafting tests + EAGLE head checkpoint loader test."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine.prompt_lookup import (make_prompt_lookup_generate,
                                          propose_ngram)
from hsd_tpu.models import init_params


def test_propose_ngram_finds_repeat():
    # context: ... 5 6 7 9 9 5 6 7 -> suffix (5,6,7) matched earlier,
    # continuation was 9 9 ...
    toks = jnp.asarray([1, 5, 6, 7, 9, 9, 5, 6, 7, 0, 0, 0], jnp.int32)
    draft, n = propose_ngram(toks, jnp.int32(9), gamma=3, max_ngram=3)
    assert int(n) >= 1
    assert int(draft[0]) == 9


def test_propose_ngram_no_match():
    toks = jnp.asarray([1, 2, 3, 4, 5, 6, 0, 0], jnp.int32)
    draft, n = propose_ngram(toks, jnp.int32(6), gamma=3, max_ngram=3)
    assert int(n) == 0


def test_prompt_lookup_generate_runs():
    cfg = ModelConfig.tiny(vocab_size=64)
    pt = init_params(cfg, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="tokenwise", gamma=3),
                      max_new_tokens=12)
    gen = make_prompt_lookup_generate(cfg, eng)
    prompt = jnp.asarray([5, 6, 7, 9, 5, 6, 7, 8], jnp.int32)
    tokens, length, accepts, blocks = gen(pt, prompt, jnp.int32(8),
                                          jax.random.PRNGKey(2))
    assert 1 <= int(length) - 8 <= 12
    out = np.asarray(tokens)[8:int(length)]
    assert ((out >= 0) & (out < 64)).all()


def test_prompt_lookup_lossless_markov():
    """Prompt-lookup acceptance must preserve the target distribution: the
    first generated token marginal equals the target regardless of what the
    lookup proposes."""
    cfg = ModelConfig.tiny(vocab_size=16, num_layers=1, hidden_size=32,
                           intermediate_size=64)
    pt = init_params(cfg, jax.random.PRNGKey(3))
    eng = EngineConfig(verifier=VerifierConfig(method="tokenwise", gamma=2),
                      max_new_tokens=2)
    gen = make_prompt_lookup_generate(cfg, eng)
    # a prompt with a repeat so proposals actually fire
    prompt = jnp.asarray([3, 4, 3, 4, 3, 4], jnp.int32)
    n = 8000
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    toks, lens, _, _ = jax.vmap(
        lambda k: gen(pt, prompt, jnp.int32(6), k))(keys)
    first = np.asarray(toks)[:, 6]
    emp = np.bincount(first, minlength=16) / n
    # analytic: AR distribution of the first token
    from hsd_tpu.engine import make_autoregressive
    from hsd_tpu.engine.kvcache import init_cache
    from hsd_tpu.models import transformer
    from hsd_tpu.ops.sampling import process_logits
    cache = init_cache(cfg, 1, 8)
    logits, _ = transformer.forward(cfg, pt, prompt[None, :], cache)
    want = np.asarray(process_logits(logits[0, -1], 1.0))
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.04, tv
