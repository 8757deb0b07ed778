#!/usr/bin/env python
"""E2E A/B of the fused-MLP pallas kernel (NEXT.md r5 item 2: the decode
residual after the wqkv fix is per-call/launch floors): full 48L int4
decode, fused SwiGLU block (ops/gptq_pallas.gptq_mlp_int4, ONE pallas_call
per layer MLP) vs the two-call composition, judged by the only honest
instrument on the relay backend — e2e ms/token, median of 3.

Usage: python scripts/ab_fused_mlp.py   (serial chip)
Env: AB_LAYERS (48), AB_NEW (96), AB_REPS (3).
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from hsd_tpu.config import EngineConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.ops import gptq_pallas

LAYERS = int(os.environ.get("AB_LAYERS", 48))
MAX_NEW = int(os.environ.get("AB_NEW", 96))
REPS = int(os.environ.get("AB_REPS", 3))

_supported = gptq_pallas.mlp_fusion_supported
_am_supported = gptq_pallas.attn_mlp_fusion_supported


def main():
    os.environ["B14_BITS"] = "4"
    os.environ["B14_QE"] = "1"
    os.environ["B14_LAYERS"] = str(LAYERS)
    import importlib
    b14 = importlib.import_module("bench_14b")
    print("backend:", jax.default_backend(), flush=True)
    params = b14.build_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params.layers["wdown"].qweight)

    cfg = b14.CFG
    eng = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)
    prompt = (jnp.arange(32, dtype=jnp.int32) % 1000) + 10

    for mode in ("two-call", "fused-mlp", "attn-mlp"):
        gptq_pallas.mlp_fusion_supported = (
            _supported if mode == "fused-mlp" else (lambda *a: False))
        gptq_pallas.attn_mlp_fusion_supported = (
            _am_supported if mode == "attn-mlp" else (lambda *a: False))
        label = f"{mode:9s}"
        gen = make_autoregressive(cfg, eng)
        toks, length = gen(params, prompt, jnp.int32(32),
                           jax.random.PRNGKey(1))
        int(length)                          # compile + true sync
        dts = []
        for i in range(2, 2 + REPS):
            t0 = time.perf_counter()
            toks, length = gen(params, prompt, jnp.int32(32),
                               jax.random.PRNGKey(i))
            n = int(length) - 32
            dts.append(time.perf_counter() - t0)
        ms = sorted(dts)[REPS // 2] / n * 1e3
        print(f"{label} {ms:6.2f} ms/token ({n / sorted(dts)[REPS // 2]:.1f} "
              f"tok/s)  raw={[round(d / n * 1e3, 2) for d in dts]}",
              flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    main()
