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


def test_striped_slots_and_telemetry():
    """Striped-tree multidraft in the slot engine (verifier.parallel=False)
    + per-request accepts/blocks telemetry and aggregate stats()."""
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng_cfg = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3,
                                                   num_drafts=2,
                                                   parallel=False),
                           max_new_tokens=8)
    eng = SlotEngine(CFG, CFG, eng_cfg, n_slots=2, bucket=16,
                     params_d=pd, params_t=pt)
    assert eng.striped and eng.R == 1 + 3 * (2 - 1)
    eng.submit(0, list(range(1, 9)))
    eng.submit(1, list(range(2, 10)))
    done = eng.run_all()
    assert sorted(r.rid for r in done) == [0, 1]
    for r in done:
        assert r.blocks >= 1
        assert 0 <= r.accepts <= r.blocks * 3
        # commits = accepts + one bonus per block (up to EOS/budget crop)
        assert len(r.out_tokens) <= r.accepts + r.blocks
    st = eng.stats()
    assert st["blocks"] >= 2 and st["committed"] >= 2
    assert st["block_efficiency"] >= 1.0
    assert st["tokens_per_s"] > 0


def test_batched_admission_scatter():
    """More pending requests than admit_batch: admissions land over several
    donated scatters, occupancy is tracked host-side (no device reads), and
    every request still completes with the right output region."""
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng_cfg = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                           max_new_tokens=6)
    eng = SlotEngine(CFG, CFG, eng_cfg, n_slots=4, bucket=16,
                     params_d=pd, params_t=pt, admit_batch=2)
    for rid in range(6):
        eng.submit(rid, list(range(1, 8 + rid)))
    # first step must admit up to all four slots (two scatter batches)
    eng._admit()
    assert sum(r >= 0 for r in eng.slot_rid) == 4
    assert len(eng.queue) == 2
    done = eng.run_all()
    assert sorted(r.rid for r in done) == list(range(6))
    for r in done:
        assert 1 <= len(r.out_tokens) <= 6
