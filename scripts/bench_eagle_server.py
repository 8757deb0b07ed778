#!/usr/bin/env python
"""EAGLE continuous-batching throughput vs slot count at Llama-3.1-8B
geometry (one chip).

The production serving lever for trie-speculation (NEXT.md r4 item 3): the
target tree forward dominates the EAGLE block (~13 of 21.5 ms at 8B — an
~8 GB int8 weight stream per block), so serving MULTIPLE requests per block
amortizes the stream across slots IF the target forward runs slot-BATCHED
(one program, activations stacked into the matvec kernels' row plane:
ops/gptq_pallas.gptq_matmul flattens leading dims). A vmapped per-slot
block does NOT amortize — vmap over pallas_call extends the grid and
re-streams the weights per slot.

This bench measures aggregate committed tok/s of engine.eagle_server.
EagleSlotEngine for ESRV_SLOTS (csv, default "1,2,4"), same coupled
int8-target/bigram-head pair as scripts/bench_eagle_e2e.py, lam calibrated
once (single-request engine, reference rule -> published BE 3.61) and
REUSED across slot counts so acceptance is held fixed while concurrency
varies. Prints one JSON line.

Env: ESRV_SLOTS ("1,2,4"), ESRV_NEW (96), ESRV_REQS_PER_SLOT (3),
ESRV_LAYERS (0 = full 32), ESRV_MODE (hsd_ref), ESRV_LAM (skip
calibration), ESRV_SCALE (6.0), ESRV_BUCKET (64).

Reference: the reference has no serving at all (single-request eagenerate,
EAGLE-3H/eagle/model/ea_model.py:194-366); its batch story is Ray fan-out
of independent processes, one model copy each.
"""
import dataclasses
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

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine.eagle_engine import make_eagle_generate
from hsd_tpu.engine.eagle_server import EagleSlotEngine
from hsd_tpu.eval.synthetic import (build_coupled_eagle_pair,
                                    make_coupled_eagle_target)
from hsd_tpu.models.eagle import EagleConfig

SLOTS_LIST = [int(s) for s in
              os.environ.get("ESRV_SLOTS", "1,2,4").split(",")]
BATCHED = bool(int(os.environ.get("ESRV_BATCHED", "1")))
MACRO = int(os.environ.get("ESRV_MACRO", "4"))
MAX_NEW = int(os.environ.get("ESRV_NEW", 96))
REQS_PER_SLOT = int(os.environ.get("ESRV_REQS_PER_SLOT", 3))
_LAYERS = int(os.environ.get("ESRV_LAYERS", 0))
MODE = os.environ.get("ESRV_MODE", "hsd_ref")
SCALE = float(os.environ.get("ESRV_SCALE", 6.0))
BUCKET = int(os.environ.get("ESRV_BUCKET", 64))
BE_TARGET = float(os.environ.get("ESRV_BE_TARGET", 3.61))

CFG = ModelConfig.llama3_8b(**({"num_layers": _LAYERS} if _LAYERS else {}))
# no early eos; bf16 MXU operands in the quantized kernels when slot-
# batched (the pool's tree forward is f32-MXU compute-bound otherwise)
CFG = dataclasses.replace(
    CFG, eos_token_id=CFG.vocab_size,
    gptq_mxu_bf16=bool(int(os.environ.get("ESRV_BF16", "1"))) and BATCHED)
ECFG = EagleConfig(
    hidden_size=CFG.hidden_size, target_hidden_size=CFG.hidden_size,
    num_heads=CFG.num_heads, num_kv_heads=CFG.num_kv_heads,
    vocab_size=CFG.vocab_size, draft_vocab_size=32000,
    intermediate_size=CFG.intermediate_size, rope_theta=CFG.rope_theta,
    top_k=10, depth=6, total_tokens=59, version=1)


def calibrate(target, head, tfwd):
    """lam such that the reference rule's BE ~= its published 3.61 (same
    bisection as scripts/bench_eagle_e2e.py, single-request engine)."""
    eng = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)
    gen = make_eagle_generate(CFG, ECFG, eng, mode="hsd_ref",
                              target_forward=tfwd)
    prompt = (jnp.arange(BUCKET, dtype=jnp.int32) % 1000) + 10
    key = jax.random.PRNGKey(0)

    def be_at(lv):
        accepts = []
        for i in range(2):
            r = gen(target._replace(lam=jnp.float32(lv)), head, prompt,
                    jnp.int32(BUCKET), jax.random.fold_in(key, 50 + i))
            accepts.extend(
                np.asarray(r.accepts)[: int(r.blocks)].tolist())
        return float(np.mean([a + 1 for a in accepts]))

    if be_at(0.0) <= BE_TARGET:
        return 0.0
    lo, hi = 0.0, SCALE
    while be_at(hi) > BE_TARGET and hi < 8 * SCALE:
        lo, hi = hi, 2 * hi
    for _ in range(4):
        mid = 0.5 * (lo + hi)
        if be_at(mid) > BE_TARGET:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    head, target = build_coupled_eagle_pair(key, CFG, ECFG, scale=SCALE,
                                            lam=0.0, big_bits=8)
    jax.block_until_ready(target.big.layers["wdown"].qweight)
    tfwd = make_coupled_eagle_target(CFG, (-1,))
    if "ESRV_LAM" in os.environ:
        lam = float(os.environ["ESRV_LAM"])
    else:
        lam = calibrate(target, head, tfwd)
        print(f"[{time.perf_counter()-t0:.0f}s] calibrated lam={lam:.3f}",
              flush=True)
    target = target._replace(lam=jnp.float32(lam))

    rng = np.random.default_rng(0)
    eng_cfg = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)
    rows = {}
    for n_slots in SLOTS_LIST:
        n_reqs = n_slots * REQS_PER_SLOT
        se = EagleSlotEngine(CFG, ECFG, eng_cfg, n_slots=n_slots,
                             bucket=BUCKET, params_t=target, params_e=head,
                             mode=MODE, seed=1,
                             admit_batch=min(4, n_slots),
                             target_forward=tfwd, batched=BATCHED,
                             steps_per_dispatch=MACRO if BATCHED else 1)
        # warm: one short request through admit+step+harvest
        se.submit(10_000, rng.integers(10, 1000, (BUCKET,)).tolist(),
                  max_new=4)
        se.run_all()
        for rid in range(n_reqs):
            n = int(rng.integers(BUCKET // 2, BUCKET))
            se.submit(rid, (rng.integers(10, 1000, (n,))).tolist(),
                      max_new=MAX_NEW)
        t1 = time.perf_counter()
        done = se.run_all()
        dt = time.perf_counter() - t1
        toks = sum(len(r.out_tokens) for r in done)
        st = se.stats()
        rows[n_slots] = {
            "tok_s": round(toks / dt, 1),
            "be": round(st["block_efficiency"], 3),
            "reqs": n_reqs, "toks": toks,
        }
        print(f"[{time.perf_counter()-t0:.0f}s] slots={n_slots}: "
              f"{toks} toks in {dt:.2f}s ({toks/dt:.1f} tok/s), "
              f"BE {st['block_efficiency']:.2f}", flush=True)
        del se

    base = rows[SLOTS_LIST[0]]["tok_s"]
    best = max(r["tok_s"] for r in rows.values())
    print(json.dumps({
        "metric": "eagle_serving_tok_s",
        "value": best,
        "unit": "tok/s",
        "vs_baseline": round(best / base, 3),
        "context": {
            "per_slots": rows, "mode": MODE, "batched": BATCHED,
            "macro": MACRO if BATCHED else 1, "lam": round(lam, 3),
            "scale": SCALE, "max_new": MAX_NEW,
            "setup": f"llama3-8B-geometry int8 coupled target "
                     f"({CFG.num_layers} layers), v1 bigram-oracle head, "
                     f"trie N=59 depth=6 top_k=10, bucket={BUCKET}",
        },
    }))


if __name__ == "__main__":
    main()
