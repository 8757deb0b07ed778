#!/usr/bin/env python
"""Measure the per-dispatch overhead of jitted calls on the axon relay as a
function of argument-pytree size: a trivial program (read one scalar from
one leaf) called with (a) a single small array, (b) the full 8B quantized
target pytree (~200 leaves), (c) the target + a batched pool cache.

Motivation: the eagle pool-step decomposition (profile_eagle_pool.py)
implies a ~27 ms fixed cost per jitted dispatch — 45x the ~0.6 ms relay
floor measured for small-arg programs (bench_14b.py). If the floor scales
with leaf count, serving steps must be MACRO-STEPPED (multiple pool blocks
per dispatch) and/or take flattened args.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import ModelConfig
from hsd_tpu.eval.synthetic import build_coupled_eagle_pair
from hsd_tpu.models.eagle import EagleConfig

CFG = ModelConfig.llama3_8b()
CFG = dataclasses.replace(CFG, eos_token_id=CFG.vocab_size)
ECFG = EagleConfig(
    hidden_size=CFG.hidden_size, target_hidden_size=CFG.hidden_size,
    num_heads=CFG.num_heads, num_kv_heads=CFG.num_kv_heads,
    vocab_size=CFG.vocab_size, draft_vocab_size=32000,
    intermediate_size=CFG.intermediate_size, rope_theta=CFG.rope_theta,
    top_k=10, depth=6, total_tokens=59, version=1)


def probe(fn, *args, reps=12):
    fn(*args).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    return ts[0], ts[len(ts) // 2]


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    head, target = build_coupled_eagle_pair(key, CFG, ECFG, scale=6.0,
                                            lam=1.3, big_bits=8)
    jax.block_until_ready(target.big.layers["wdown"].qweight)
    x = jnp.ones((8, 128), jnp.float32)
    cache_k = jnp.zeros((32, 8, 340, 8, 128), jnp.bfloat16)

    f_small = jax.jit(lambda a: jnp.sum(a[:1, :1]))
    f_params = jax.jit(
        lambda p, a: jnp.sum(a[:1, :1])
        + p.big.layers["wqkv"].scales[0, 0, 0].astype(jnp.float32))
    f_cache = jax.jit(
        lambda p, c, a: jnp.sum(a[:1, :1])
        + p.big.layers["wqkv"].scales[0, 0, 0].astype(jnp.float32)
        + c[0, 0, 0, 0, 0].astype(jnp.float32))

    n_leaves = len(jax.tree.leaves(target))
    for name, (mn, md) in {
        "small-1-leaf": probe(f_small, x),
        f"target-{n_leaves}-leaves": probe(f_params, target, x),
        "target+cache": probe(f_cache, target, cache_k, x),
    }.items():
        print(f"{name:24s} min {mn*1e3:6.2f} ms  med {md*1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
