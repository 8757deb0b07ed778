#!/usr/bin/env python
"""Qwen2.5-14B-geometry int8 decode probe on one TPU chip.

Reconstructs the docs/BENCHMARKS.md scale-stress setup with DEVICE-SIDE
random weight init (no 14GB host->device stream through the tunnel) and
decomposes the per-token cost:

  * isolated per-matvec times at the four 14B layer shapes + the bf16 head
    (ITERS-slope methodology: slope between chained runs isolates the true
    per-iteration cost from the ~0.6ms relay dispatch/fetch floor);
  * end-to-end AR decode ms/token;
  * the residual = attention/norms/rope + op dispatch overhead.

Memory model (fits 16GB v5e): symmetric int8 codes (zeros=None), bf16
scales, tied bf16 head. Usage:
  env PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_14b.py
Env: B14_LAYERS (default 48), B14_NEW (default 32), B14_ITERS.
"""
import functools
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.models.transformer import ModelParams, fuse_params
from hsd_tpu.ops.linear import QuantizedLinear, apply_linear

LAYERS = int(os.environ.get("B14_LAYERS", 48))
MAX_NEW = int(os.environ.get("B14_NEW", 32))
ITERS = int(os.environ.get("B14_ITERS", 128))
BITS = int(os.environ.get("B14_BITS", 8))      # 8 = speed, 4 = capacity path
SKIP_MATVEC = bool(int(os.environ.get("B14_SKIP_MATVEC", "0")))
# fully-int8 embedding + untied int8 head (models/transformer
# QuantizedEmbedding): frees ~0.8GiB vs the tied bf16 head and halves the
# per-token head stream — what lets the FULL 48-layer int8 model fit 16GB
QE = bool(int(os.environ.get("B14_QE", "0")))
GS = 128

CFG = ModelConfig.qwen2_14b(num_layers=LAYERS, tie_word_embeddings=not QE,
                            attention_bias=False)


@functools.partial(jax.jit, static_argnames=("din", "dout", "layers"))
def _init_q(key, din, dout, layers):
    """Device-side symmetric quantized weights, stacked on [layers].
    Codes are generated per layer under lax.map so the PRNG's u32 bit
    intermediates never materialize at full [L, in, out] size (4x the int8
    array). BITS=4 packs two signed nibbles per uint8 row-pair
    (ops/linear.pack_int4 convention)."""
    from hsd_tpu.ops.linear import pack_int4

    kc, ks = jax.random.split(key)
    if BITS == 4:
        gen = lambda k: pack_int4(
            jax.random.randint(k, (din, dout), -8, 8, jnp.int8))
    else:
        gen = lambda k: jax.random.randint(k, (din, dout), -127, 128,
                                           jnp.int8)
    codes = jax.lax.map(gen, jax.random.split(kc, layers))
    scales = (jnp.abs(jax.random.normal(ks, (layers, din // GS, dout))) * 1e-2
              + 1e-3).astype(jnp.bfloat16)
    return QuantizedLinear(qweight=codes, scales=scales, zeros=None)


def build_params(key):
    D, F, L = CFG.hidden_size, CFG.intermediate_size, CFG.num_layers
    H, Hkv, hd = CFG.num_heads, CFG.num_kv_heads, CFG.head_dim_
    ks = jax.random.split(key, 8)
    # init the FUSED layout directly (wqkv / wgu) — running fuse_params on a
    # 14B model would hold original + concatenated copies concurrently and
    # bust HBM
    layers = dict(
        ln1=jnp.ones((L, D), jnp.float32),
        ln2=jnp.ones((L, D), jnp.float32),
        wqkv=_init_q(ks[0], D, (H + 2 * Hkv) * hd, L),
        wo=_init_q(ks[3], H * hd, D, L),
        wgu=_init_q(ks[4], D, 2 * F, L),
        wdown=_init_q(ks[6], F, D, L),
    )
    if QE:
        from hsd_tpu.models.transformer import QuantizedEmbedding
        k1, k2 = jax.random.split(ks[7])
        embed = QuantizedEmbedding(
            codes=jax.random.randint(k1, (CFG.vocab_size, D), -127, 128,
                                     jnp.int8),
            scale=jnp.full((CFG.vocab_size,), 2e-4, jnp.float32))
        head = jax.tree.map(lambda a: a[0],
                            _init_q(k2, D, CFG.vocab_size, 1))
        return ModelParams(embed=embed, layers=layers,
                           final_norm=jnp.ones((D,), jnp.float32),
                           lm_head=head)
    embed = (jax.random.normal(ks[7], (CFG.vocab_size, D), jnp.float32)
             * 0.02).astype(jnp.bfloat16)
    return ModelParams(embed=embed, layers=layers,
                       final_norm=jnp.ones((D,), jnp.float32), lm_head=None)


@functools.partial(jax.jit, static_argnames=("n",))
def _chain(w, x, n):
    def body(i, acc):
        y = apply_linear(w, x + acc * 1e-20)  # data-dep: prevents CSE
        return acc + y[0, :1].astype(jnp.float32)
    return jax.lax.fori_loop(0, n, body, jnp.zeros((1,), jnp.float32))


def slope_time(w, x, iters=ITERS):
    """Per-iteration cost via the ITERS-slope method (docs/BENCHMARKS.md):
    chain data-dependent iterations inside one jit; the slope between a short
    and a long chain cancels the fixed dispatch/fetch cost. Every call gets a
    DIFFERENT input and the scalar result is fetched — the tunnel relay
    elides repeated identical dispatches (negative slopes otherwise)."""
    import numpy as np
    lo, hi = max(4, iters // 5), iters
    seed = [0]

    def timed(n):
        seed[0] += 1
        xs = x * (1.0 + seed[0] * 1e-3)
        t0 = time.perf_counter()
        r = np.asarray(_chain(w, xs, n))       # forced fetch
        assert np.isfinite(r).all()
        return time.perf_counter() - t0

    timed(lo); timed(hi)                        # compile both variants
    t_lo = min(timed(lo) for _ in range(3))
    t_hi = min(timed(hi) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    params = build_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params.layers["wdown"].qweight)
    D, F = CFG.hidden_size, CFG.intermediate_size
    x = jnp.ones((1, D), jnp.bfloat16)
    xf = jnp.ones((1, F), jnp.bfloat16)

    shapes = {}
    if SKIP_MATVEC:
        matvec_us, wbytes = 1.0, 0
    l0 = None if SKIP_MATVEC else jax.tree.map(lambda a: a[0], params.layers)
    total_bytes = 0
    for name, xin in () if SKIP_MATVEC else (("wqkv", x), ("wgu", x),
                                             ("wdown", xf)):
        w = l0[name]
        us = slope_time(w, xin) * 1e6
        nbytes = w.qweight.size + w.scales.size * 2
        gbps = nbytes / (us * 1e-6) / 1e9
        total_bytes += nbytes
        shapes[name] = (us, gbps)
        print(f"{name:6s} [{w.qweight.shape}] {us:7.1f} us  {gbps:6.0f} GB/s",
              flush=True)
    if not SKIP_MATVEC:
        us = slope_time(params.embed.T, x) * 1e6
        head_bytes = params.embed.size * 2
        print(f"head   [{params.embed.shape}] {us:7.1f} us  "
              f"{head_bytes / (us * 1e-6) / 1e9:6.0f} GB/s", flush=True)

        per_layer_us = sum(v[0] for v in shapes.values())
        matvec_us = per_layer_us * CFG.num_layers + us
        wbytes = total_bytes * CFG.num_layers + head_bytes
        print(f"\nmatvec-sum prediction: {matvec_us / 1e3:.2f} ms/token "
              f"({wbytes / 2**30:.2f} GiB weights -> "
              f"{wbytes / (matvec_us * 1e-6) / 1e9:.0f} GB/s aggregate)",
              flush=True)

    eng = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)
    gen = make_autoregressive(CFG, eng)
    prompt = (jnp.arange(32, dtype=jnp.int32) % 1000) + 10
    toks, length = gen(params, prompt, jnp.int32(32), jax.random.PRNGKey(1))
    jax.block_until_ready(toks)
    # median of 3 with a FORCED FETCH inside the timed region:
    # block_until_ready alone can return before device completion on the
    # relay backend (observed 2026-08-21: three back-to-back "timed" runs at
    # 0.6ms each on a 16ms/token model) — only a value fetch is a true sync.
    # The scalar fetch adds one ~0.6ms RTT, negligible vs the 0.5-1s run.
    dts, n = [], 0
    for i in (2, 3, 4):
        t0 = time.perf_counter()
        toks, length = gen(params, prompt, jnp.int32(32),
                           jax.random.PRNGKey(i))
        n = int(length) - 32
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    ms = dt / n * 1e3
    print(f"e2e AR decode: {ms:.1f} ms/token ({n / dt:.1f} tok/s); "
          f"non-matvec residual {ms - matvec_us / 1e3:.1f} ms "
          f"({(1 - matvec_us / 1e3 / ms) * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
