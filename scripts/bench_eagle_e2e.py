#!/usr/bin/env python
"""MEASURED EAGLE end-to-end throughput at Llama-3.1-8B geometry (one chip).

Replaces the round-2 extrapolation (block-cost x published BE) with a real
`make_eagle_generate` run: an int8 8B-geometry target coupled to a
v1 bigram-oracle EAGLE head (eval/synthetic.build_bigram_eagle_head — full
head compute, exactly representable acceptance), trie N=59/depth=6/top_k=10
(the reference's published shape, EAGLE-3H/README.md:41-46). `lam` is
auto-calibrated so trie-HSD block efficiency lands at the reference's
published 3.61; greedy/typical/HSD then run e2e on the SAME coupled pair and
report MEASURED BE + tok/s next to the AR baseline — the measured analog of
the reference's gen_ea_answer_llama3chat.py:411-533 timing loop.

Cost note: the v1 head is slightly cheaper than the v3 head (qkv input D vs
2D, fc 2D->D vs 3D->D); scripts/bench_eagle_8b.py measures the v3 block cost
separately (12.05 ms r2) — the target tree forward dominates both.

Env: E2E_NEW (96), E2E_PROMPTS (2), E2E_AR_NEW (24), E2E_SCALE (3.0),
E2E_LAM (skip calibration), E2E_BE_TARGET (3.61), E2E_LAYERS (0 = full 32),
E2E_MODES (csv, default hsd,typical,greedy).
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
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.engine.eagle_engine import make_eagle_generate
from hsd_tpu.eval.synthetic import (build_coupled_eagle_pair,
                                    make_coupled_eagle_target, oracle_logits)
from hsd_tpu.models import transformer
from hsd_tpu.models.eagle import EagleConfig

MAX_NEW = int(os.environ.get("E2E_NEW", 96))
N_PROMPTS = int(os.environ.get("E2E_PROMPTS", 3))
AR_NEW = int(os.environ.get("E2E_AR_NEW", 24))
SCALE = float(os.environ.get("E2E_SCALE", 6.0))
BE_TARGET = float(os.environ.get("E2E_BE_TARGET", 3.61))
_LAYERS = int(os.environ.get("E2E_LAYERS", 0))
MODES = os.environ.get("E2E_MODES", "hsd_ref,hsd,typical,greedy").split(",")
# calibration target mode: hsd_ref is the reference's own (raw-frontier)
# rule behind its published BE 3.61 — `hsd` here is the stricter
# exact-lossless capped variant (docs/LOSSLESSNESS.md)
CAL_MODE = os.environ.get("E2E_CAL_MODE", "hsd_ref")

CFG = ModelConfig.llama3_8b(**({"num_layers": _LAYERS} if _LAYERS else {}))
# eos out of range: the synthetic bigram chain must not truncate early
CFG = dataclasses.replace(CFG, eos_token_id=CFG.vocab_size)
ECFG = EagleConfig(
    hidden_size=CFG.hidden_size, target_hidden_size=CFG.hidden_size,
    num_heads=CFG.num_heads, num_kv_heads=CFG.num_kv_heads,
    vocab_size=CFG.vocab_size,
    draft_vocab_size=int(os.environ.get("E2E_DVOCAB", 32000)),
    intermediate_size=CFG.intermediate_size, rope_theta=CFG.rope_theta,
    top_k=10, depth=6, total_tokens=59, version=1)
PROMPT = (jnp.arange(64, dtype=jnp.int32) % 1000) + 10
PLEN = jnp.int32(64)


def run(gen, target, head, key, n_prompts=N_PROMPTS, warm=True):
    toks = 0
    secs = 0.0
    accepts = []
    if warm:  # compile + cache warmup outside the timed loop
        r = gen(target, head, PROMPT, PLEN, jax.random.fold_in(key, 999))
        int(r.ncommit)                     # TRUE sync: scalar fetch
    for i in range(n_prompts):
        # scalar fetch INSIDE the timed region: block_until_ready alone can
        # return before device completion on the relay backend (2026-08-21)
        t0 = time.perf_counter()
        res = gen(target, head, PROMPT, PLEN, jax.random.fold_in(key, 50 + i))
        nc = int(res.ncommit)
        secs += time.perf_counter() - t0
        toks += nc
        # BE from per-block telemetry (accept_len + 1), not ncommit/blocks:
        # the max_new clamp truncates the final block's commits
        accepts.extend(np.asarray(res.accepts)[: int(res.blocks)].tolist())
    if n_prompts == 0:
        return 0.0, 0.0
    return float(np.mean([a + 1 for a in accepts])), toks / secs


def main():
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    head, target = build_coupled_eagle_pair(key, CFG, ECFG, scale=SCALE,
                                            lam=0.0, big_bits=8)
    jax.block_until_ready(target.big.layers["wdown"].qweight)
    build_s = time.perf_counter() - t0
    tfwd = make_coupled_eagle_target(CFG, (-1,))
    eng = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)

    gens = {m: make_eagle_generate(CFG, ECFG, eng, mode=m,
                                   target_forward=tfwd) for m in MODES}

    # ---- calibrate lam so trie-HSD BE ~= the published 3.61 ----------------
    cal_gen = gens.get(CAL_MODE) or gens[MODES[0]]
    if "E2E_LAM" in os.environ:
        lam, cal_log = float(os.environ["E2E_LAM"]), []
    else:
        cal_log = []
        # one compile warm; probes reuse it (lam is a traced scalar)
        run(cal_gen, target, head, jax.random.fold_in(key, 7), n_prompts=0)

        def be_at(lv):
            # probe on the SAME key stream as the measurement (bench.py's
            # round-2 lesson): per-key BE spread is large on short runs
            be, _ = run(cal_gen, target._replace(lam=jnp.float32(lv)), head,
                        jax.random.fold_in(key, 9), n_prompts=N_PROMPTS,
                        warm=False)
            cal_log.append((round(lv, 3), round(be, 3)))
            return be

        be0 = be_at(0.0)
        if be0 <= BE_TARGET:
            lam = 0.0
        else:
            lo, hi = 0.0, SCALE
            while be_at(hi) > BE_TARGET and hi < 8 * SCALE:
                lo, hi = hi, 2 * hi
            for _ in range(4):
                mid = 0.5 * (lo + hi)
                if be_at(mid) > BE_TARGET:
                    lo = mid
                else:
                    hi = mid
            lam = 0.5 * (lo + hi)
        print(f"calibrated lam={lam:.3f} probes={cal_log}", flush=True)
    target = target._replace(lam=jnp.float32(lam))

    results = {}
    for m in MODES:
        results[m] = run(gens[m], target, head, jax.random.fold_in(key, 9))
        print(f"[{time.perf_counter() - t0:.0f}s] {m}: BE "
              f"{results[m][0]:.3f}  {results[m][1]:.1f} tok/s", flush=True)

    # ---- AR baseline: plain decode of the SAME coupled target --------------
    def ar_fwd(cp, tokens, cache):
        big_logits, cache = transformer.forward(CFG, cp.big, tokens, cache)
        u = oracle_logits(cp, tokens)

        def std(x):
            mu = jnp.mean(x, -1, keepdims=True)
            return (x - mu) / (jnp.std(x, -1, keepdims=True) + 1e-6)

        return cp.scale * std(u) + cp.lam * std(big_logits), cache

    ar = make_autoregressive(
        CFG, EngineConfig(max_new_tokens=AR_NEW, temperature=1.0),
        model_forward=ar_fwd)
    r = ar(target, PROMPT, PLEN, jax.random.PRNGKey(7))
    int(r[1])                                   # compile + TRUE sync
    t1 = time.perf_counter()
    toks, length = ar(target, PROMPT, PLEN, jax.random.PRNGKey(8))
    n_ar = int(length) - 64                     # fetch inside timed region
    ar_tps = n_ar / (time.perf_counter() - t1)

    be_h, tps_h = results.get(CAL_MODE) or results.get("hsd") \
        or results[MODES[0]]
    ctx = {
        "ar_tok_s": round(ar_tps, 1),
        "lam": round(lam, 3), "scale": SCALE,
        "build_s": round(build_s, 1),
        "setup": f"llama3-8B-geometry int8 target ({CFG.num_layers} layers, "
                 f"V={CFG.vocab_size}), v1 bigram-oracle head, trie N=59 "
                 f"depth=6 top_k=10, max_new={MAX_NEW}, "
                 f"prompts={N_PROMPTS}",
    }
    for m, (be, tps) in results.items():
        ctx[m] = {"be": round(be, 3), "tok_s": round(tps, 1),
                  "speedup_vs_ar": round(tps / ar_tps, 2)}
    print(json.dumps({
        "metric": "eagle_e2e_be_hsd",
        "value": round(be_h, 3),
        "unit": "tokens/step",
        "vs_baseline": round(be_h / 3.61, 3),
        "context": ctx,
    }))


if __name__ == "__main__":
    main()
