#!/usr/bin/env python
"""EAGLE trie benchmark: typical vs HSD trie verification (BE uplift).

Reproduces the shape of the reference's EAGLE-3H headline (BE 3.22 -> 3.61,
+12.1% with HSD and no retraining — EAGLE-3H/README.md:58-63) without network
access: a synthetic target (random weights, sharpened logits) and an EAGLE-3
head MINI-DISTILLED on-device against that target's own rollouts (the same
multi-step soft-CE objective as train/eagle3.py), then `eagenerate` with
mode='typical' (the EAGLE default verifier) vs mode='hsd' (trie-HSD) on the
same keys.

Prints one JSON line: metric = trie-HSD block efficiency; vs_baseline =
BE_hsd / BE_typical compared to the reference's 1.121 uplift ratio.

Env knobs: EBENCH_STEPS (distill steps), EBENCH_MAX_NEW, EBENCH_PROMPTS,
EBENCH_SCALE (target logit sharpening).
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import make_autoregressive
from hsd_tpu.engine.eagle_engine import (default_feature_layers,
                                         make_eagle_generate)
from hsd_tpu.models import init_params
from hsd_tpu.models.eagle import EagleConfig, init_eagle_params
from hsd_tpu.train.eagle3 import (TrainConfig, init_train_state,
                                  make_train_step)

STEPS = int(os.environ.get("EBENCH_STEPS", 3000))
MAX_NEW = int(os.environ.get("EBENCH_MAX_NEW", 128))
N_PROMPTS = int(os.environ.get("EBENCH_PROMPTS", 4))
SCALE = float(os.environ.get("EBENCH_SCALE", 2.0))
SEQ = 96
BATCH = 16


def main():
    cfg = ModelConfig.tiny(vocab_size=2048, hidden_size=256,
                           intermediate_size=512, num_layers=4, num_heads=4,
                           num_kv_heads=2, dtype=jnp.bfloat16,
                           eos_token_id=2047)
    pt = init_params(cfg, jax.random.PRNGKey(0))
    pt = pt._replace(embed=(pt.embed.astype(jnp.float32) * SCALE
                            ).astype(cfg.dtype))
    ecfg = EagleConfig(hidden_size=256, target_hidden_size=256, num_heads=4,
                       num_kv_heads=2, vocab_size=2048, draft_vocab_size=2048,
                       intermediate_size=512, top_k=8, depth=5,
                       total_tokens=47, dtype=jnp.bfloat16,
                       rope_theta=cfg.rope_theta)
    pe = init_eagle_params(ecfg, jax.random.PRNGKey(1))

    # ---- rollouts from the target itself (the distillation corpus) --------
    eng_ar = EngineConfig(max_new_tokens=SEQ - 8, temperature=1.0)
    ar = make_autoregressive(cfg, eng_ar)
    prompts = (jax.random.randint(jax.random.PRNGKey(2), (BATCH, 8), 10, 1000,
                                  dtype=jnp.int32))
    toks, lens = jax.vmap(lambda p, k: ar(pt, p, jnp.int32(8), k))(
        prompts, jax.random.split(jax.random.PRNGKey(3), BATCH))
    ids = toks[:, :SEQ].astype(jnp.int32)
    mask = (jnp.arange(SEQ)[None, :] < lens[:, None]).astype(jnp.float32)

    # ---- mini-distill the head (multi-step soft-CE, train/eagle3.py) ------
    tc = TrainConfig(steps=3, lr=3e-3, warmup_steps=100, total_steps=STEPS,
                     max_len=SEQ)
    state = init_train_state(pe, tc)
    step = make_train_step(cfg, ecfg, tc, default_feature_layers(cfg))
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, pt, ids, mask)
    loss = float(metrics["loss"])
    train_s = time.perf_counter() - t0
    pe = state.params

    # ---- eagenerate: typical vs trie-HSD on the same keys ------------------
    results = {}
    eng = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)
    prompt = (jnp.arange(16, dtype=jnp.int32) % 1000) + 10
    for mode in ("hsd", "typical"):
        gen = make_eagle_generate(cfg, ecfg, eng, mode=mode)
        accepts, toks_n, secs = [], 0, 0.0
        for i in range(N_PROMPTS):
            k = jax.random.fold_in(jax.random.PRNGKey(7), i)
            r = gen(pt, pe, prompt, jnp.int32(16), k)      # compile/warm
            r.tokens.block_until_ready()
            t0 = time.perf_counter()
            r = gen(pt, pe, prompt, jnp.int32(16),
                    jax.random.fold_in(jax.random.PRNGKey(100), i))
            n = int(r.ncommit)
            secs += time.perf_counter() - t0
            toks_n += n
            accepts.extend(
                (np.asarray(r.accepts)[:int(r.blocks)] + 1).tolist())
        results[mode] = (float(np.mean(accepts)), toks_n / secs)

    be_hsd, tps_hsd = results["hsd"]
    be_typ, tps_typ = results["typical"]
    print(json.dumps({
        "metric": "eagle_trie_be_hsd",
        "value": round(be_hsd, 3),
        "unit": "tokens/step",
        "vs_baseline": round((be_hsd / max(be_typ, 1e-9)) / 1.121, 3),
        "context": {
            "typical_be": round(be_typ, 3),
            "hsd_tok_s": round(tps_hsd, 1),
            "typical_tok_s": round(tps_typ, 1),
            "uplift": round(be_hsd / max(be_typ, 1e-9), 3),
            "reference_uplift": 1.121,
            "distill": f"{STEPS} steps, final loss {loss:.3f}, "
                       f"{train_s:.0f}s",
        },
    }))


if __name__ == "__main__":
    main()
