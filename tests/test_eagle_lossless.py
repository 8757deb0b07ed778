"""End-to-end EAGLE losslessness: the token stream from eagenerate (trie
draft + typical / trie-HSD verification) must be distributed as target AR
sampling. Compared empirically (vmapped full generates) against AR samples
of the same target."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.engine.eagle_engine import make_eagle_generate
from hsd_tpu.models import init_params
from hsd_tpu.models.eagle import EagleConfig, init_eagle_params

V = 16
TCFG = ModelConfig.tiny(vocab_size=V, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, num_kv_heads=2,
                        eos_token_id=V - 1)
ECFG = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                   num_kv_heads=2, vocab_size=V, draft_vocab_size=V,
                   intermediate_size=64, top_k=2, depth=2, total_tokens=5,
                   dtype=jnp.float32, rope_theta=10000.0)
PROMPT = jnp.asarray([1, 2, 3, 4, 5, 6], jnp.int32)
N = 6000
T = 2


def _joint(toks, T):
    flat = np.zeros(len(toks), np.int64)
    for j in range(T):
        flat = flat * V + toks[:, j]
    return np.bincount(flat, minlength=V ** T) / len(toks)


def _tv(a, b):
    return 0.5 * float(np.abs(a - b).sum())


@pytest.mark.parametrize("mode", ["typical", "hsd"])
def test_eagle_stream_matches_ar(mode):
    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    eng = EngineConfig(max_new_tokens=T + 1, temperature=1.0)
    gen = make_eagle_generate(TCFG, ECFG, eng, mode=mode)
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    res = jax.vmap(lambda k: gen(pt, pe, PROMPT, jnp.int32(6), k))(keys)
    # drop trials that hit EOS before T tokens (distribution of the prefix
    # conditional on no-EOS is compared on both sides identically)
    toks = np.asarray(res.tokens)[:, 6:6 + T]
    ok = np.asarray(res.length) >= 6 + T
    emp = _joint(toks[ok], T)

    ar = make_autoregressive(TCFG, eng)
    t_ar, l_ar = jax.vmap(lambda k: ar(pt, PROMPT, jnp.int32(6), k))(
        jax.random.split(jax.random.PRNGKey(3), N))
    toks_ar = np.asarray(t_ar)[:, 6:6 + T]
    ok_ar = np.asarray(l_ar) >= 6 + T
    want = _joint(toks_ar[ok_ar], T)

    tv = _tv(emp, want)
    # two-empirical comparison: noise floor ~ sqrt(2*C/(pi*N))-ish; C=256,
    # N~6000 -> ~0.08. Threshold 1.6x.
    assert tv < 0.13, f"eagle {mode}: TV {tv:.4f}"
