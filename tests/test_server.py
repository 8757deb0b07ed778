"""Continuous batching (slot engine) tests."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine.server import SlotEngine
from hsd_tpu.models import init_params

CFG = ModelConfig.tiny(vocab_size=64)


def _engine(n_slots=2, max_new=8, K=1):
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3,
                                               num_drafts=K),
                      max_new_tokens=max_new)
    return SlotEngine(CFG, CFG, eng, n_slots=n_slots, bucket=16,
                      params_d=pd, params_t=pt)


def test_more_requests_than_slots():
    eng = _engine(n_slots=2)
    for rid in range(5):
        eng.submit(rid, list(range(1, 9 + rid)))
    done = eng.run_all()
    assert sorted(r.rid for r in done) == [0, 1, 2, 3, 4]
    for r in done:
        assert 1 <= len(r.out_tokens) <= 8
        assert ((r.out_tokens >= 0) & (r.out_tokens < 64)).all()


def test_incremental_admission():
    eng = _engine(n_slots=2)
    eng.submit(0, list(range(1, 10)))
    out = []
    steps = 0
    while steps < 50 and (eng.queue or eng.running or steps == 0):
        out.extend(eng.step())
        steps += 1
        if steps == 2:
            eng.submit(1, list(range(3, 12)))  # admitted mid-flight
        if not eng.queue and not eng.running:
            break
    assert sorted(r.rid for r in out) == [0, 1]


def test_multidraft_slots():
    eng = _engine(n_slots=2, K=2)
    eng.submit(0, list(range(1, 9)))
    eng.submit(1, list(range(2, 10)))
    done = eng.run_all()
    assert sorted(r.rid for r in done) == [0, 1]
