#!/usr/bin/env python
"""Realistic-divergence regime: trained oracle target + distilled draft
(eval/oracle.py), measuring EVERY headline delta in one run:

  * tokenwise / blockwise / hsd BE at gamma=10 (reference table:
    5.99 / 6.13 / 6.30 at 14B, README.md:121-125 — uplift +2.3% / +5.2%);
  * the EAGLE trie ordering typical vs hsd at production geometry
    (top_k=10, depth=6, total_tokens=59; reference: +12.1% BE,
    EAGLE-3H/README.md:58-63) with the accept-length histogram to compare
    against the shipped telemetry (results/h100_HSD/*_info.jsonl:
    typical [.203 .121 .109 .098 .080 .072 .317] BE 4.22,
    hsd     [.138 .104 .113 .106 .092 .093 .354] BE 4.61, +9.3%).

The draft-side temperature (oracle.scale_draft_temperature) is bisected so
TOKENWISE BE lands at 5.99 — the same one-scalar calibration bench.py uses
for the int8-coupled regime, but on a trained-pair ratio distribution.

Env knobs: RB_TARGET_STEPS, RB_DISTILL_STEPS, RB_HEAD_STEPS, RB_PROMPTS,
RB_MAX_NEW, RB_GAMMA, RB_TAU (skip calibration), RB_SKIP_EAGLE,
RB_DET_FRAC, RB_BRANCH_MAX, RB_DRAFT_LAYERS, RB_DRAFT_HIDDEN.
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
from hsd_tpu.engine import make_generate
from hsd_tpu.engine.eagle_engine import (default_feature_layers,
                                         make_eagle_generate)
from hsd_tpu.eval.oracle import (make_language, distill_lm, ratio_stats,
                                 sample_tokens, scale_draft_temperature,
                                 train_lm)
from hsd_tpu.models.eagle import EagleConfig, init_eagle_params
from hsd_tpu.train.eagle3 import TrainConfig, init_train_state, make_train_step

V = int(os.environ.get("RB_VOCAB", 2048))
TARGET_STEPS = int(os.environ.get("RB_TARGET_STEPS", 1800))
DISTILL_STEPS = int(os.environ.get("RB_DISTILL_STEPS", 1800))
HEAD_STEPS = int(os.environ.get("RB_HEAD_STEPS", 1500))
N_PROMPTS = int(os.environ.get("RB_PROMPTS", 8))
MAX_NEW = int(os.environ.get("RB_MAX_NEW", 256))
GAMMA = int(os.environ.get("RB_GAMMA", 10))
DET_FRAC = float(os.environ.get("RB_DET_FRAC", 0.35))
BRANCH_MAX = int(os.environ.get("RB_BRANCH_MAX", 12))
MAX_WLEN = int(os.environ.get("RB_MAX_WLEN", 4))
ZIPF = float(os.environ.get("RB_ZIPF", 1.2))
N_WORDS = int(os.environ.get("RB_N_WORDS", 600))
DLAYERS = int(os.environ.get("RB_DRAFT_LAYERS", 2))
DHID = int(os.environ.get("RB_DRAFT_HIDDEN", 160))
SKIP_EAGLE = bool(int(os.environ.get("RB_SKIP_EAGLE", "0")))
HEAD_INTER = int(os.environ.get("RB_HEAD_INTER", 512))
SKIP_SPEC = bool(int(os.environ.get("RB_SKIP_SPEC", "0")))
SEQ, BATCH = 96, 64

CFG_T = ModelConfig.tiny(vocab_size=V, hidden_size=256,
                         intermediate_size=512, num_layers=4, num_heads=4,
                         num_kv_heads=2, dtype=jnp.float32,
                         tie_word_embeddings=False, eos_token_id=V - 1)
CFG_D = ModelConfig.tiny(vocab_size=V, hidden_size=DHID,
                         intermediate_size=2 * DHID, num_layers=DLAYERS,
                         num_heads=4, num_kv_heads=2, dtype=jnp.float32,
                         tie_word_embeddings=False, eos_token_id=V - 1)


def run_engine(gen, pd, pt, prompts, key, n_prompts):
    """(be, tok_s, accept_hist[gamma+1]) over n_prompts; scalar fetch inside
    the timed region (relay sync)."""
    accepts, toks, secs = [], 0, 0.0
    r = gen(pd, pt, prompts[0], jnp.int32(prompts.shape[1]),
            jax.random.fold_in(key, 999))
    int(r.ncommit)
    for i in range(n_prompts):
        t0 = time.perf_counter()
        res = gen(pd, pt, prompts[i % len(prompts)],
                  jnp.int32(prompts.shape[1]), jax.random.fold_in(key, i))
        nc = int(res.ncommit)
        secs += time.perf_counter() - t0
        toks += nc
        accepts.extend(np.asarray(res.accepts)[:int(res.blocks)].tolist())
    acc = np.asarray(accepts)
    be = float(np.mean(acc + 1)) if acc.size else 0.0
    hist = np.bincount(np.clip(acc, 0, None), minlength=GAMMA + 1)
    return be, toks / secs if secs else 0.0, (hist / max(len(acc), 1))


def main():
    key = jax.random.PRNGKey(0)
    t00 = time.time()
    lang = make_language(jax.random.fold_in(key, 1), vocab=V,
                         n_words=N_WORDS, max_wlen=MAX_WLEN,
                         det_frac=DET_FRAC, branch_max=BRANCH_MAX,
                         zipf_exp=ZIPF)

    t0 = time.time()
    pt, target_ce = train_lm(CFG_T, jax.random.fold_in(key, 2), lang,
                             steps=TARGET_STEPS, batch=BATCH, seq=SEQ)
    print(f"[{time.time()-t00:.0f}s] target trained CE={target_ce:.3f}",
          flush=True)
    if SKIP_SPEC:
        _eagle_only(key, t00, lang, pt, target_ce)
        return
    pd, distill_ce = distill_lm(CFG_D, CFG_T, pt, jax.random.fold_in(key, 3),
                                lang, steps=DISTILL_STEPS, batch=BATCH,
                                seq=SEQ)
    train_s = time.time() - t0
    print(f"[{time.time()-t00:.0f}s] draft distilled softCE={distill_ce:.3f}",
          flush=True)

    st = ratio_stats(CFG_D, CFG_T, pd, pt, lang, jax.random.fold_in(key, 4),
                     gamma=GAMMA)
    print(f"[{time.time()-t00:.0f}s] ratio stats {st}", flush=True)

    prompts = sample_tokens(jax.random.fold_in(key, 5), lang, max(N_PROMPTS, 4), 64)

    def spec_gen(method, K=1):
        eng = EngineConfig(
            verifier=VerifierConfig(method=method, gamma=GAMMA, num_drafts=K),
            max_new_tokens=MAX_NEW)
        return make_generate(CFG_D, CFG_T, eng)

    gen_tok = spec_gen("tokenwise")

    # ---- calibrate draft temperature so tokenwise BE ~ 5.99 ---------------
    cal_log = []

    def be_at(tau):
        pdt = scale_draft_temperature(pd, CFG_D, tau)
        be, _, _ = run_engine(gen_tok, pdt, pt, prompts,
                              jax.random.fold_in(key, 6), max(4, N_PROMPTS // 2))
        cal_log.append((round(tau, 3), round(be, 3)))
        return be

    if "RB_TAU" in os.environ:
        tau = float(os.environ["RB_TAU"])
    else:
        be1 = be_at(1.0)
        if be1 < 5.99:
            # draft too weak even untempered: sharpen (tau < 1) helps only
            # while q's top tokens agree with p; probe a short ladder
            lo_t, hi_t = 0.6, 1.0
            be_lo = be_at(lo_t)
            if max(be1, be_lo) < 5.7:
                print(f"WARNING: cannot reach BE 5.99 "
                      f"(be(1.0)={be1:.2f}, be({lo_t})={be_lo:.2f}) — "
                      f"retrain with stronger draft", flush=True)
            tau = lo_t if be_lo > be1 else 1.0
            for _ in range(3):
                mid = 0.5 * (lo_t + hi_t)
                if be_at(mid) > 5.99:
                    lo_t = mid
                else:
                    hi_t = mid
                tau = 0.5 * (lo_t + hi_t)
        else:
            lo_t, hi_t = 1.0, 2.0       # flatten until BE drops to 5.99
            while be_at(hi_t) > 5.99 and hi_t < 6.0:
                lo_t, hi_t = hi_t, hi_t * 1.5
            for _ in range(4):
                mid = 0.5 * (lo_t + hi_t)
                if be_at(mid) > 5.99:
                    lo_t = mid
                else:
                    hi_t = mid
                if abs(cal_log[-1][1] - 5.99) < 0.08:
                    break
            tau = cal_log[-1][0]
    print(f"[{time.time()-t00:.0f}s] calibrated tau={tau} probes={cal_log}",
          flush=True)
    pdt = scale_draft_temperature(pd, CFG_D, tau)
    st_cal = ratio_stats(CFG_D, CFG_T, pdt, pt, lang,
                         jax.random.fold_in(key, 4), gamma=GAMMA)

    # ---- measure all three verifiers --------------------------------------
    rows = {}
    for m in ("tokenwise", "blockwise", "hsd"):
        be, tps, hist = run_engine(spec_gen(m), pdt, pt, prompts,
                                   jax.random.fold_in(key, 7), N_PROMPTS)
        rows[m] = {"be": round(be, 3), "tok_s": round(tps, 1),
                   "accept_hist": np.round(hist, 3).tolist()}
        print(f"[{time.time()-t00:.0f}s] {m} {rows[m]['be']} BE "
              f"{rows[m]['tok_s']} tok/s", flush=True)

    up_hsd = rows["hsd"]["be"] / rows["tokenwise"]["be"]
    up_blk = rows["blockwise"]["be"] / rows["tokenwise"]["be"]

    out = {
        "metric": "realistic_be_hsd",
        "value": rows["hsd"]["be"],
        "unit": "tokens/step",
        "vs_baseline": round(rows["hsd"]["be"] / 6.30, 3),
        "context": {
            "regime": "trained-oracle pair (mixed-entropy language; "
                      f"target 4L256H CE={target_ce:.3f}, draft "
                      f"{DLAYERS}L{DHID}H distilled softCE={distill_ce:.3f}, "
                      f"tau={tau})",
            "rows": rows,
            "uplift_hsd_vs_tokenwise": round(up_hsd, 4),
            "uplift_blockwise_vs_tokenwise": round(up_blk, 4),
            "reference_uplifts": {"hsd": 1.052, "blockwise": 1.023},
            "ratio_stats": st_cal,
            "train_s": round(train_s, 1),
        },
    }

    # ---- EAGLE trie ordering at production geometry -----------------------
    if not SKIP_EAGLE:
        out["context"]["eagle"] = eagle_rows(key, t00, lang, pt, prompts)

    print(json.dumps(out))


def eagle_rows(key, t00, lang, pt, prompts):
    """Distill an EAGLE-3 head off the trained target and measure the trie
    verifier modes at production geometry. Returns the context dict."""
    ecfg = EagleConfig(hidden_size=256, target_hidden_size=256,
                       num_heads=4, num_kv_heads=2, vocab_size=V,
                       draft_vocab_size=V, intermediate_size=HEAD_INTER,
                       top_k=10, depth=6, total_tokens=59,
                       dtype=jnp.float32, rope_theta=CFG_T.rope_theta)
    pe = init_eagle_params(ecfg, jax.random.fold_in(key, 8))
    tc = TrainConfig(steps=3, lr=2e-3,
                     warmup_steps=min(100, max(1, HEAD_STEPS // 5)),
                     total_steps=HEAD_STEPS, max_len=SEQ)
    state = init_train_state(pe, tc)
    hstep = make_train_step(CFG_T, ecfg, tc, default_feature_layers(CFG_T))
    mask = jnp.ones((BATCH, SEQ), jnp.float32)
    t0 = time.time()
    for i in range(HEAD_STEPS):
        ids = sample_tokens(jax.random.fold_in(jax.random.PRNGKey(17), i),
                            lang, BATCH, SEQ)
        state, metrics = hstep(state, pt, ids, mask)
    pe = state.params
    print(f"[{time.time()-t00:.0f}s] head distilled acc0="
          f"{float(metrics['acc_0']):.3f} ({time.time()-t0:.0f}s)",
          flush=True)

    emodes = {}
    eng = EngineConfig(max_new_tokens=128, temperature=1.0)
    for mode in ("typical", "hsd", "hsd_ref", "greedy"):
        egen = make_eagle_generate(CFG_T, ecfg, eng, mode=mode)
        accepts, per_prompt, toks, secs = [], [], 0, 0.0
        r = egen(pt, pe, prompts[0], jnp.int32(64),
                 jax.random.fold_in(key, 900))
        int(r.ncommit)
        for i in range(N_PROMPTS):
            t0 = time.perf_counter()
            r = egen(pt, pe, prompts[i % len(prompts)], jnp.int32(64),
                     jax.random.fold_in(key, 300 + i))
            nc = int(r.ncommit)
            secs += time.perf_counter() - t0
            toks += nc
            a = np.asarray(r.accepts)[:int(r.blocks)]
            accepts.extend(a.tolist())
            if a.size:
                per_prompt.append(float(np.mean(a + 1)))
        acc = np.asarray(accepts)
        hist = np.bincount(np.clip(acc, 0, None), minlength=7)
        ci = (1.96 * float(np.std(per_prompt, ddof=1))
              / len(per_prompt) ** 0.5 if len(per_prompt) > 1 else 0.0)
        emodes[mode] = {
            "be": round(float(np.mean(acc + 1)), 3),
            "be_ci95": round(ci, 3),
            "tok_s": round(toks / secs, 1),
            "accept_hist": np.round(hist / max(len(acc), 1), 3).tolist(),
        }
        print(f"[{time.time()-t00:.0f}s] eagle {mode} {emodes[mode]}",
              flush=True)
    return {
        "modes": emodes,
        "head_steps": HEAD_STEPS,
        "uplift_hsd_vs_typical": round(
            emodes["hsd"]["be"] / emodes["typical"]["be"], 4),
        "reference": {"typical_be": 4.217, "hsd_be": 4.608,
                      "uplift": 1.093,
                      "typical_hist": [.203, .121, .109, .098, .080,
                                       .072, .317],
                      "hsd_hist": [.138, .104, .113, .106, .092, .093,
                                   .354],
                      "source": "EAGLE-3H/results/h100_*/"
                                "*_info.jsonl (80 GSM8K questions)"},
    }


def _eagle_only(key, t00, lang, pt, target_ce):
    prompts = sample_tokens(jax.random.fold_in(key, 5), lang,
                            max(N_PROMPTS, 4), 64)
    ctx = eagle_rows(key, t00, lang, pt, prompts)
    print(json.dumps({"metric": "realistic_eagle_only",
                      "target_ce": round(target_ce, 3), "eagle": ctx}))


if __name__ == "__main__":
    main()
