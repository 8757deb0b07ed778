"""Profiling utils + batched generate tests."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import make_generate, make_generate_batched
from hsd_tpu.models import init_params
from hsd_tpu.utils import StageClock, Timer


def test_timer_and_stageclock():
    x = jnp.ones((64, 64))
    with Timer("mm", sync=None) as t:
        y = (x @ x).block_until_ready()
    assert t.elapsed > 0
    clk = StageClock()
    with clk.stage("draft"):
        pass
    with clk.stage("draft"):
        pass
    with clk.stage("verify"):
        pass
    row = clk.row()
    assert len(row["draft_time"][0]) == 2
    assert "verify_time" in row


def test_batched_generate_matches_single():
    cfg = ModelConfig.tiny(vocab_size=64)
    pd = init_params(cfg, jax.random.PRNGKey(0))
    pt = init_params(cfg, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                       max_new_tokens=8)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    prompts = jnp.stack([prompt, prompt + 1])
    plens = jnp.asarray([8, 6], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)

    bgen = make_generate_batched(cfg, cfg, eng)
    bres = bgen(pd, pt, prompts, plens, keys)
    assert bres.tokens.shape[0] == 2
    gen = make_generate(cfg, cfg, eng)
    r0 = gen(pd, pt, prompts[0], plens[0], keys[0])
    n = int(r0.length)
    np.testing.assert_array_equal(np.asarray(bres.tokens)[0, :n],
                                  np.asarray(r0.tokens)[:n])
    assert int(bres.ncommit[1]) >= 1
