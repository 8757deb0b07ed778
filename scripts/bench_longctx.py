#!/usr/bin/env python
"""Long-context decode: step time vs cache length, flash-decode on/off.

Extends the docs/BENCHMARKS.md long-context table (grouped-GQA + KV-in-carry
rows) with the ops/flash_decode.py kernel: one decode step at a FIXED cache
length, ITERS-slope timed (chained data-dependent steps inside one jit so the
tunnel's dispatch/fetch floor cancels).

Env: LC_LAYERS (default 24), LC_LENS (comma list, default 1056,2080,4128),
LC_ITERS (default 24), LC_BITS, LC_T (query block size: 1 = AR decode,
11 = spec-verify block — the regime where score traffic scales with T).
Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_longctx.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import hsd_tpu.ops.flash_decode as fd
from hsd_tpu.config import ModelConfig
from hsd_tpu.engine.kvcache import init_cache
from hsd_tpu.eval.synthetic import init_quantized_params
from hsd_tpu.models import transformer

LAYERS = int(os.environ.get("LC_LAYERS", 24))
LENS = [int(x) for x in os.environ.get("LC_LENS", "1056,2080,4128").split(",")]
ITERS = int(os.environ.get("LC_ITERS", 24))
BITS = int(os.environ.get("LC_BITS", 8))
T = int(os.environ.get("LC_T", 1))

CFG = ModelConfig.qwen2_14b(num_layers=LAYERS)


@functools.partial(jax.jit, static_argnames=("n",))
def _chain(params, cache, tok0, n):
    """n chained single-token decode steps at FIXED cache length (the
    returned cache is dropped; each step re-appends at the same slot).
    Data dependence through the sampled token prevents CSE/elision."""
    def body(i, carry):
        tok, acc = carry
        toks = jnp.broadcast_to(tok, (1, T))
        logits, c2 = transformer.forward(CFG, params, toks, cache)
        nt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        return nt, acc + logits[0, -1, 0].astype(jnp.float32) * 1e-9
    _, acc = jax.lax.fori_loop(0, n, body, (tok0, jnp.float32(0)))
    return acc


def step_ms(params, cache, lo=max(4, ITERS // 4), hi=ITERS):
    def timed(n, seed):
        t0 = time.perf_counter()
        r = np.asarray(_chain(params, cache, jnp.int32(11 + seed), n))
        assert np.isfinite(r)
        return time.perf_counter() - t0
    timed(lo, 0); timed(hi, 1)                 # compile
    t_lo = min(timed(lo, 2 + i) for i in range(3))
    t_hi = min(timed(hi, 9 + i) for i in range(3))
    return (t_hi - t_lo) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    params = init_quantized_params(CFG, jax.random.PRNGKey(0), bits=BITS)
    jax.block_until_ready(params.layers["wdown"].qweight)
    for L in LENS:
        S = L + 64
        cache = init_cache(CFG, 1, S)
        # mark L slots valid (content irrelevant for timing; buffers are 0)
        cache = cache._replace(length=jnp.int32(L))
        row = {"len": L}
        # "always" (not "auto"): since commit 5f32dcc the kernel is pure
        # opt-in — use_flash() routes nothing under "auto", which would
        # silently benchmark the einsum path against itself here
        for mode in ("off", "always"):
            fd.FLASH_DECODE = mode
            _chain.clear_cache()
            row[mode] = step_ms(params, cache)
        print(f"len={L:5d}  einsum {row['off']:7.2f} ms/step   "
              f"flash {row['always']:7.2f} ms/step   "
              f"({row['off'] / row['always']:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
