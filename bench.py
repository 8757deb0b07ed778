#!/usr/bin/env python
"""Speculative-decoding benchmark on one TPU chip.

Setup (no network access — synthetic weights with a realistic acceptance
profile): the target is a Qwen2.5-0.5B-geometry decoder (bf16, random weights,
sharpened logits); the draft is the SAME model with every matmul quantized to
GPTQ-style int4 — so draft/target divergence comes from quantization noise,
the same mechanism as the reference's GPTQ pipelines. gamma=10, temperature 1,
matching the reference harness defaults (eval_speculative_decoding_llm.py:126-138).

Prints ONE json line:
  metric       block efficiency of HSD verification (tokens per target step)
  vs_baseline  value / 6.30 — the reference's published HSD BE at 14B
               (README.md:121-125), the smallest published target
plus context fields (tokenwise BE, decode tok/s) for the record.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import make_autoregressive, make_generate
from hsd_tpu.models import init_params
from hsd_tpu.ops.linear import QuantizedLinear, quantize

GAMMA = int(os.environ.get("BENCH_GAMMA", 10))
MAX_NEW = int(os.environ.get("BENCH_MAX_NEW", 256))
LOGIT_SCALE = 4.0  # sharpens synthetic-weight logits into a realistic regime
_LAYERS = int(os.environ.get("BENCH_LAYERS", 0))   # 0 = full 0.5B depth


def build_models(key):
    cfg = ModelConfig.qwen2_05b(**({"num_layers": _LAYERS} if _LAYERS else {}))
    target = init_params(cfg, key)
    target = target._replace(
        embed=(target.embed.astype(jnp.float32) * LOGIT_SCALE).astype(cfg.dtype))

    def quant_stacked(w, bits):
        L = w.shape[0]
        qs = [quantize(w[i].astype(jnp.float32), bits=bits, group_size=128)
              for i in range(L)]
        return QuantizedLinear(
            qweight=jnp.stack([q.qweight for q in qs]),
            scales=jnp.stack([q.scales for q in qs]),
            zeros=jnp.stack([q.zeros for q in qs]))

    dl = dict(target.layers)
    for name in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        dl[name] = quant_stacked(target.layers[name], bits=4)
    draft = target._replace(layers=dl)
    return cfg, draft, target


def run(gen, pd, pt, prompt, plen, key, n_prompts=2):
    accepts, toks, secs = [], 0, 0.0
    for i in range(n_prompts):
        res = gen(pd, pt, prompt, plen, jax.random.fold_in(key, i))
        res.tokens.block_until_ready()
        t0 = time.perf_counter()
        res = gen(pd, pt, prompt, plen, jax.random.fold_in(key, 100 + i))
        res.tokens.block_until_ready()
        secs += time.perf_counter() - t0
        toks += int(res.ncommit)
        accepts.extend(np.asarray(res.accepts)[:int(res.blocks)].tolist())
    be = float(np.mean([a + 1 for a in accepts])) if accepts else 0.0
    return be, toks / secs


def main():
    key = jax.random.PRNGKey(0)
    cfg, pd, pt = build_models(key)
    prompt = (jnp.arange(64, dtype=jnp.int32) % 1000) + 10
    plen = jnp.int32(64)

    results = {}
    for method in ("hsd", "tokenwise"):
        eng = EngineConfig(
            verifier=VerifierConfig(method=method, gamma=GAMMA, num_drafts=1),
            max_new_tokens=MAX_NEW)
        gen = make_generate(cfg, cfg, eng)
        be, tps = run(gen, pd, pt, prompt, plen, jax.random.fold_in(key, hash(method) % 1000))
        results[method] = (be, tps)

    be_hsd, tps_hsd = results["hsd"]
    be_tok, tps_tok = results["tokenwise"]
    print(json.dumps({
        "metric": "block_efficiency_hsd",
        "value": round(be_hsd, 3),
        "unit": "tokens/step",
        "vs_baseline": round(be_hsd / 6.30, 3),
        "context": {
            "tokenwise_be": round(be_tok, 3),
            "hsd_tok_s": round(tps_hsd, 1),
            "tokenwise_tok_s": round(tps_tok, 1),
            "speedup_hsd_vs_tokenwise": round(tps_hsd / tps_tok, 3),
            "setup": "synthetic 0.5B-geometry bf16 target, int4-GPTQ draft, gamma=10",
        },
    }))


if __name__ == "__main__":
    main()
