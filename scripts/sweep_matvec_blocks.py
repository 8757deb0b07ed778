#!/usr/bin/env python
"""Per-shape (block_in, block_out) sweep for the quantized matvec kernels
at Qwen2.5-14B decode shapes (NEXT.md r4 item 2: wqkv streams at 509 GB/s
vs 633-650 for wgu/wdown — is the auto-pick leaving rate on the table?).

Times gptq_matmul DIRECTLY (layer-stacked + fused RMS norm, the production
decode configuration) with the ITERS-slope method from bench_14b.py.

Env: SWP_BITS (4), SWP_ITERS (64), SWP_SHAPES (csv of wqkv,wgu,wdown).
Prints GB/s per (shape, bi, bo) and the auto-pick's result for reference.
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

from hsd_tpu.ops.gptq_pallas import gptq_matmul
from hsd_tpu.ops.linear import QuantizedLinear, pack_int4

BITS = int(os.environ.get("SWP_BITS", 4))
ITERS = int(os.environ.get("SWP_ITERS", 64))
GS = 128
L = 4          # stacked layers: enough to exercise the scalar-prefetch path

# Qwen2.5-14B decode shapes (D=5120, H=40, Hkv=8, hd=128, F=13824)
SHAPES = {
    "wqkv": (5120, (40 + 16) * 128),
    "wgu": (5120, 2 * 13824),
    "wdown": (13824, 5120),
}


@functools.partial(jax.jit, static_argnames=("din", "dout"))
def _init_q(key, din, dout):
    kc, ks = jax.random.split(key)
    if BITS == 4:
        gen = lambda k: pack_int4(
            jax.random.randint(k, (din, dout), -8, 8, jnp.int8))
    else:
        gen = lambda k: jax.random.randint(k, (din, dout), -127, 128,
                                           jnp.int8)
    codes = jax.lax.map(gen, jax.random.split(kc, L))
    scales = (jnp.abs(jax.random.normal(ks, (L, din // GS, dout))) * 1e-2
              + 1e-3).astype(jnp.bfloat16)
    return QuantizedLinear(qweight=codes, scales=scales, zeros=None)


def slope_time(fn, iters=ITERS):
    @functools.partial(jax.jit, static_argnames=("n",))
    def _chain(x, n):
        def body(i, acc):
            y = fn(x + acc * 1e-20, (i % L).astype(jnp.int32))
            return acc + y[0, :1].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))

    lo, hi = max(4, iters // 5), iters
    seed = [0]
    D = fn.din

    def timed(n):
        seed[0] += 1
        xs = jnp.full((1, D), 1.0 + seed[0] * 1e-3, jnp.bfloat16)
        t0 = time.perf_counter()
        r = np.asarray(_chain(xs, n))
        assert np.isfinite(r).all()
        return time.perf_counter() - t0

    timed(lo); timed(hi)
    t_lo = min(timed(lo) for _ in range(3))
    t_hi = min(timed(hi) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), "bits:", BITS, flush=True)
    names = os.environ.get("SWP_SHAPES", "wqkv,wgu,wdown").split(",")
    for name in names:
        din, dout = SHAPES[name]
        w = _init_q(jax.random.PRNGKey(0), din, dout)
        jax.block_until_ready(w.qweight)
        ln = jnp.ones((din,), jnp.float32)
        nbytes = w.qweight[0].size + w.scales[0].size * 2
        rows = din // 2 if BITS == 4 else din

        def run(bi, bo, label):
            def fn(x, layer):
                return gptq_matmul(x, w, block_out=bo, block_in=bi,
                                   layer_index=layer, ln=ln)
            fn.din = din
            try:
                us = slope_time(fn) * 1e6
            except Exception as e:  # illegal combo: report and move on
                print(f"  {name} bi={bi:5d} bo={bo:5d}  FAIL "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                return
            print(f"  {name} bi={bi:5d} bo={bo:5d}  {us:7.1f} us  "
                  f"{nbytes / (us * 1e-6) / 1e9:6.0f} GB/s  {label}",
                  flush=True)

        print(f"{name}: [{din} -> {dout}] {nbytes / 2**20:.1f} MB/layer",
              flush=True)
        run(0, 0, "auto")
        gsk = GS // 2 if BITS == 4 else GS
        bis = sorted({bi for bi in (rows, rows // 2, rows // 4, rows // 5,
                                    2560, 1280, 640)
                      if 0 < bi <= rows and rows % bi == 0
                      and bi % gsk == 0})
        bos = sorted({bo for bo in (dout, dout // 2, dout // 4, dout // 8,
                                    3584, 2560, 1792, 1280)
                      if 128 <= bo <= dout})
        for bi in bis:
            for bo in bos:
                run(bi, bo, "")


if __name__ == "__main__":
    main()
