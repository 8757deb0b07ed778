#!/usr/bin/env python
"""Decompose the slot-batched EAGLE pool step (engine/eagle_server
batched=True) into its three phases at 8B geometry:

  1. beam   — vmapped absorb_window (head beam trie per slot)
  2. target — ONE slot-batched tree-masked target forward (per-row lengths)
  3. rest   — vmapped verify/commit + batched path compaction

Times each phase as its own jitted program (scalar fetch inside the timed
region — relay sync), for PEP_SLOTS (csv). This is the measurement behind
the batched-pool optimization loop: the r4 first-cut measured SLOWER than
the vmapped pool at 4 slots (84 vs 136 tok/s), so something in the batched
path burns more than the weight stream it saves.

Env: PEP_SLOTS ("1,2,4,8"), PEP_LAYERS (0=32), PEP_REPS (8).
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

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine.eagle_engine import make_eagle_block, make_eagle_pool
from hsd_tpu.engine.kvcache import KVCache, compact_path_batched
from hsd_tpu.eval.synthetic import (build_coupled_eagle_pair,
                                    make_coupled_eagle_target)
from hsd_tpu.models.eagle import EagleConfig
from hsd_tpu.ops.sampling import processor

SLOTS = [int(s) for s in os.environ.get("PEP_SLOTS", "1,2,4,8").split(",")]
_LAYERS = int(os.environ.get("PEP_LAYERS", 0))
REPS = int(os.environ.get("PEP_REPS", 8))
BUCKET = 64
MAX_NEW = 96

CFG = ModelConfig.llama3_8b(**({"num_layers": _LAYERS} if _LAYERS else {}))
CFG = dataclasses.replace(
    CFG, eos_token_id=CFG.vocab_size,
    gptq_mxu_bf16=bool(int(os.environ.get("PEP_BF16", "1"))))
ECFG = EagleConfig(
    hidden_size=CFG.hidden_size, target_hidden_size=CFG.hidden_size,
    num_heads=CFG.num_heads, num_kv_heads=CFG.num_kv_heads,
    vocab_size=CFG.vocab_size, draft_vocab_size=32000,
    intermediate_size=CFG.intermediate_size, rope_theta=CFG.rope_theta,
    top_k=10, depth=6, total_tokens=59, version=1)
ENG = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        # fetch one scalar leaf for a true sync
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    head, target = build_coupled_eagle_pair(key, CFG, ECFG, scale=6.0,
                                            lam=1.312, big_bits=8)
    jax.block_until_ready(target.big.layers["wdown"].qweight)
    tfwd = make_coupled_eagle_target(CFG, (-1,))
    prefill1, _, absorb, commit = make_eagle_block(CFG, ECFG, ENG,
                                                   mode="hsd_ref",
                                                   target_forward=tfwd)
    temp = processor(ENG.temperature, ENG.top_k, ENG.top_p)
    pool_block = make_eagle_pool(CFG, ECFG, ENG, mode="hsd_ref",
                                 target_forward=tfwd)
    prompt = (jnp.arange(BUCKET, dtype=jnp.int32) % 1000) + 10

    # params ride as ARGUMENTS, never closure constants (engine/server.py
    # lesson: closed-over weights embed into the serialized HLO — observed
    # here as a 10.4GB captured-constants lowering stall)
    def pf(tgt_p, head_p, p, n, k):
        t, l, tc, ek, fb, _ = prefill1(tgt_p, head_p, p, n, k)
        return t, l, tc, ek, fb
    pfj = jax.jit(jax.vmap(pf, in_axes=(None, None, None, None, 0)))

    def beam(head_p, ek, fb, tok, ln):
        return jax.vmap(absorb, in_axes=(None, 0, 0, 0, 0))(
            head_p, ek, fb, tok, ln - 1)
    beamj = jax.jit(beam)

    def tgt(tgt_p, tc, dtok, mask, pids, lens_):
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
        base = lens_ - 1
        pos = pids + (base - tc.start)[:, None]
        return tfwd(tgt_p, dtok, tc, bias, pos, lengths=base,
                    staging_at=tc.max_len - (ECFG.total_tokens + 1))
    tgtj = jax.jit(tgt)

    def tgt_uniform(tgt_p, tc, dtok, mask, pids, lens_):
        """Variant: all rows share ONE frontier (scalar cache.length, the
        pre-existing tree path batched over B) — isolates the cost of the
        per-row lengths/staging machinery from batched tree attention
        itself. Only valid when all lens_ are equal (the profiler prefills
        identical prompts)."""
        bias = jnp.where(mask[0], 0.0, -1e30).astype(jnp.float32)
        base = lens_ - 1
        pos = pids + (base - tc.start)[:, None]
        tc = tc._replace(length=base[0])
        return tfwd(tgt_p, dtok, tc, bias, pos)
    tgt_uj = jax.jit(tgt_uniform)

    from hsd_tpu.engine.kvcache import compact_path_staged

    def rest(tl, tr, tf, tok, ln, tc, fb, ks):
        probs = temp(tl)
        kk = jax.vmap(jax.random.split)(ks)
        (tok2, ln2, acc, plen, he, sel, nc, fb2) = jax.vmap(commit)(
            tr, probs, tf, tok, ln, kk[:, 0], kk[:, 1], fb)
        tc = compact_path_staged(tc, sel, nc, ln - 1,
                                 src_base=tc.max_len
                                 - (ECFG.total_tokens + 1))
        return tok2, ln2, acc, tc, fb2
    restj = jax.jit(rest)
    pbj = jax.jit(pool_block)
    NSTG = ECFG.total_tokens + 1

    for B in SLOTS:
        # B prefilled slots, batched cache layout + staging tail
        toks, lens, tcs, eks, fbs = pfj(target, head, prompt,
                                        jnp.int32(BUCKET),
                                        jax.random.split(key, B))
        pad = ((0, 0), (0, 0), (0, NSTG), (0, 0), (0, 0))
        tcache = KVCache(
            k=jnp.moveaxis(jnp.pad(tcs.k[:, :, 0], pad), 0, 1),
            v=jnp.moveaxis(jnp.pad(tcs.v[:, :, 0], pad), 0, 1),
            length=jnp.int32(0), start=tcs.start[:, 0])
        keys = jax.random.split(jax.random.fold_in(key, 7), B)

        t_beam, (trie, eks2) = timeit(beamj, head, eks, fbs, toks, lens)
        t_tgt, (tlogits, tcache2, tfeats) = timeit(
            tgtj, target, tcache, trie.draft_tokens, trie.tree_mask,
            trie.position_ids, lens)
        t_tgtu, _ = timeit(
            tgt_uj, target, tcache, trie.draft_tokens, trie.tree_mask,
            trie.position_ids, lens)
        print(f"B={B}: target-uniform {t_tgtu*1e3:7.2f} ms", flush=True)
        t_rest, _ = timeit(restj, tlogits, trie, tfeats, toks, lens,
                           tcache2, fbs, keys)
        t_full, _ = timeit(pbj, target, head, toks, lens, tcache, eks,
                           fbs, keys)

        print(f"B={B}: beam {t_beam*1e3:7.2f} ms  target {t_tgt*1e3:7.2f} "
              f"ms  rest {t_rest*1e3:7.2f} ms  | full {t_full*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
