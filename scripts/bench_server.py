#!/usr/bin/env python
"""Serving throughput: SlotEngine continuous batching vs lockstep batch.

Compares aggregate committed-token throughput of the slot engine (requests
admitted/harvested continuously, VERDICT r1 item 10) against the lockstep
alternative (wait for the whole batch to finish before starting the next),
on the same synthetic coupled draft/target pair as bench.py but at a smaller
geometry so both fit comfortably beside each other.

Prints one JSON line with slot-engine tok/s, lockstep tok/s, and the ratio.
Env: SRV_SLOTS (4), SRV_REQS (12), SRV_MAX_NEW (64), SRV_BUCKET (64),
SRV_LAYERS (8).
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine.server import SlotEngine
from hsd_tpu.models import init_params

SLOTS = int(os.environ.get("SRV_SLOTS", 4))
REQS = int(os.environ.get("SRV_REQS", 12))
MAX_NEW = int(os.environ.get("SRV_MAX_NEW", 64))
BUCKET = int(os.environ.get("SRV_BUCKET", 64))
LAYERS = int(os.environ.get("SRV_LAYERS", 8))
MACRO = int(os.environ.get("SRV_MACRO", 1))

CFG = ModelConfig.qwen2_05b(num_layers=LAYERS, vocab_size=32000)


HET = bool(int(os.environ.get("SRV_HET", "1")))


def prompts(rng):
    # (prompt, max_new) pairs. SRV_HET=1 (default) draws HETEROGENEOUS
    # budgets in [MAX_NEW/4, MAX_NEW] -- the regime continuous batching
    # exists for (short requests free slots early; lockstep waves idle
    # until the longest request of each wave drains).
    out = []
    for i in range(REQS):
        n = int(rng.integers(BUCKET // 2, BUCKET))
        mn = int(rng.integers(MAX_NEW // 4, MAX_NEW + 1)) if HET else MAX_NEW
        out.append((rng.integers(1, 31000, (n,)).tolist(), mn))
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng_cfg = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=5),
                           max_new_tokens=MAX_NEW, temperature=1.0)
    rng = np.random.default_rng(0)
    ps = prompts(rng)

    # --- slot engine: continuous admission --------------------------------
    eng = SlotEngine(CFG, CFG, eng_cfg, n_slots=SLOTS, bucket=BUCKET,
                     params_d=pd, params_t=pt, steps_per_dispatch=MACRO)
    # warm ALL paths incl. the first-harvest host update (one throwaway
    # request run to completion): the old single-step warm left a ~1.5s
    # first-harvest cost inside the timed region, flipping the comparison
    eng.submit(10_000, ps[0][0], max_new=8)
    eng.step()
    eng.run_all()
    for rid, (p, mn) in enumerate(ps):
        eng.submit(rid, p, max_new=mn)
    t0 = time.perf_counter()
    done = eng.run_all()
    slot_time = time.perf_counter() - t0
    slot_toks = sum(len(r.out_tokens) for r in done)
    st = eng.stats()
    print(f"slot engine: {slot_toks} toks in {slot_time:.2f}s "
          f"({slot_toks / slot_time:.1f} tok/s), BE {st['block_efficiency']:.2f}",
          flush=True)

    # --- lockstep baseline: same slots, but admission only at batch
    # boundaries (drain fully between waves) ------------------------------
    eng2 = SlotEngine(CFG, CFG, eng_cfg, n_slots=SLOTS, bucket=BUCKET,
                      params_d=pd, params_t=pt, steps_per_dispatch=MACRO)
    lock_toks = 0
    # warm with one wave step
    eng2.submit(10_000, ps[0][0], max_new=ps[0][1])
    eng2.step()
    eng2.run_all()
    t0 = time.perf_counter()
    for wave in range(0, len(ps), SLOTS):
        for rid, (p, mn) in enumerate(ps[wave:wave + SLOTS]):
            eng2.submit(wave + rid, p, max_new=mn)
        done2 = eng2.run_all()
        lock_toks += sum(len(r.out_tokens) for r in done2)
    lock_time = time.perf_counter() - t0
    print(f"lockstep waves: {lock_toks} toks in {lock_time:.2f}s "
          f"({lock_toks / lock_time:.1f} tok/s)", flush=True)

    out = {
        "metric": "server_throughput",
        "value": round(slot_toks / slot_time, 1),
        "unit": "tok/s",
        "vs_baseline": round((slot_toks / slot_time)
                             / (lock_toks / lock_time), 3),
        "context": {"slots": SLOTS, "requests": REQS, "max_new": MAX_NEW,
                    "macro": MACRO,
                    "block_efficiency": round(st["block_efficiency"], 3),
                    "lockstep_tok_s": round(lock_toks / lock_time, 1)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
