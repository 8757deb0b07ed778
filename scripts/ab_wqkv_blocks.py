#!/usr/bin/env python
"""E2E A/B of wqkv block shapes on the full 48L int4 decode (NEXT.md r4
item 2 / VERDICT r4 weak #5): wqkv streams at 509-523 GB/s vs 633-650 for
its siblings, and per-matvec microbenches over-read on the relay backend
(docs/BENCHMARKS.md) — so candidates are judged by the ONLY honest
instrument, e2e ms/token.

Mechanism: the auto-pick gives wqkv (bi=2560, bo=1280) — the same tile as
wgu but only 6 grid steps, so the pipeline prologue amortizes worse.
Candidates inject (block_in, block_out) into gptq_matmul for the wqkv
shape ONLY (rows=2560, dout=7168 packed int4) by wrapping the op, decode
npad=8 only (prefill keeps auto).

Usage: python scripts/ab_wqkv_blocks.py   (serial chip, ~30 min)
Env: AB_LAYERS (48), AB_NEW (32), AB_CANDS ("bi,bo;bi,bo;...").
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.ops import gptq_pallas

LAYERS = int(os.environ.get("AB_LAYERS", 48))
MAX_NEW = int(os.environ.get("AB_NEW", 32))
CANDS = [tuple(int(v) for v in c.split(","))
         for c in os.environ.get(
             "AB_CANDS", "0,0;256,7168;640,7168;1280,2560").split(";")]

_orig = gptq_pallas.gptq_matmul
_OVR = {"bi": 0, "bo": 0}


def _patched(x, qw, block_out=0, block_in=0, **kw):
    rows, dout = qw.qweight.shape[-2:]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    if (rows, dout) == (2560, 7168) and n <= 8 and _OVR["bi"]:
        block_in, block_out = _OVR["bi"], _OVR["bo"]
    return _orig(x, qw, block_out=block_out, block_in=block_in, **kw)


def main():
    gptq_pallas.gptq_matmul = _patched
    import hsd_tpu.ops.linear  # noqa: F401  (resolves from module ns at call)

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

    for bi, bo in CANDS:
        _OVR["bi"], _OVR["bo"] = bi, bo
        label = "auto" if bi == 0 else f"bi={bi} bo={bo}"
        try:
            gen = make_autoregressive(cfg, eng)
            toks, length = gen(params, prompt, jnp.int32(32),
                               jax.random.PRNGKey(1))
            int(length)                       # compile + true sync
            dts = []
            for i in (2, 3, 4):
                t0 = time.perf_counter()
                toks, length = gen(params, prompt, jnp.int32(32),
                                   jax.random.PRNGKey(i))
                n = int(length) - 32
                dts.append(time.perf_counter() - t0)
            ms = sorted(dts)[1] / n * 1e3
            print(f"wqkv {label:16s} {ms:6.2f} ms/token "
                  f"({n / sorted(dts)[1]:.1f} tok/s)", flush=True)
        except Exception as e:  # noqa: BLE001 — illegal combo: report, go on
            print(f"wqkv {label:16s} FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    main()
