#!/usr/bin/env python
"""EAGLE trie benchmark: typical vs HSD trie verification (BE uplift).

Reproduces the shape of the reference's EAGLE-3H headline (BE 3.22 -> 3.61,
+12.1% with HSD and no retraining — EAGLE-3H/README.md:58-63) without network
access, as a three-phase on-device pipeline:

  1. TARGET TRAINING: a tiny decoder is trained by next-token CE on a
     synthetic low-entropy language (sparse order-1 Markov chain). A trained
     target has smooth, predictable representations — the property real LMs
     have and that EAGLE heads rely on. (Random-weight targets are chaotic:
     their next-state map is unlearnable by a 1-layer head, verified
     empirically — fresh-data distillation plateaus at chance.)
  2. HEAD DISTILLATION: an EAGLE-3 head is trained against the frozen target
     with the multi-step soft-CE objective (train/eagle3.py), fresh data per
     step (no memorization).
  3. MEASUREMENT: `eagenerate` over all verifier modes on the same keys —
     typical (EAGLE default), hsd (exact capped frontier), hsd_ref
     (the committed reference's raw frontier), greedy.

Prints one JSON line: metric = trie-HSD block efficiency; vs_baseline =
(BE_hsd / BE_typical) / 1.121, the reference's uplift ratio. NOTE on the
ordering: on low-entropy synthetic regimes typical legitimately accepts more
than HSD — the REFERENCE'S OWN implementation shows the same ordering on
identical inputs (pinned in tests/test_ref_differential.py); the published
+12.1% uplift is a property of the real-LM regime (deep tries, partial
per-node probability mass).

Env knobs: EBENCH_TARGET_STEPS, EBENCH_HEAD_STEPS, EBENCH_MAX_NEW,
EBENCH_PROMPTS, EBENCH_BRANCH (Markov branching factor).
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
import optax

from hsd_tpu.config import EngineConfig, ModelConfig
from hsd_tpu.engine import init_cache
from hsd_tpu.engine.eagle_engine import (default_feature_layers,
                                         make_eagle_generate)
from hsd_tpu.models import init_params, transformer
from hsd_tpu.models.eagle import EagleConfig, init_eagle_params
from hsd_tpu.train.eagle3 import (TrainConfig, init_train_state,
                                  make_train_step)

TARGET_STEPS = int(os.environ.get("EBENCH_TARGET_STEPS", 1500))
HEAD_STEPS = int(os.environ.get("EBENCH_HEAD_STEPS", 1500))
MAX_NEW = int(os.environ.get("EBENCH_MAX_NEW", 128))
N_PROMPTS = int(os.environ.get("EBENCH_PROMPTS", 4))
BRANCH = int(os.environ.get("EBENCH_BRANCH", 4))
V, SEQ, BATCH = 2048, 96, 64


def make_language(key):
    """Sparse order-1 Markov chain: each state has BRANCH successors with
    Zipf-ish weights — low-entropy, fully learnable."""
    succ = jax.random.randint(key, (V, BRANCH), 0, V, dtype=jnp.int32)
    w = 1.0 / (1.0 + jnp.arange(BRANCH, dtype=jnp.float32))
    probs = w / w.sum()
    return succ, probs


def sample_corpus(key, succ, probs, batch, seq):
    k0, k1 = jax.random.split(key)
    x0 = jax.random.randint(k0, (batch,), 0, V, dtype=jnp.int32)

    def step(x, k):
        b = jax.random.choice(k, BRANCH, (batch,), p=probs)
        nxt = succ[x, b]
        return nxt, nxt

    _, xs = jax.lax.scan(step, x0, jax.random.split(k1, seq - 1))
    return jnp.concatenate([x0[None], xs]).T            # [batch, seq]


def main():
    cfg = ModelConfig.tiny(vocab_size=V, hidden_size=256,
                           intermediate_size=512, num_layers=4, num_heads=4,
                           num_kv_heads=2, dtype=jnp.float32,
                           eos_token_id=V - 1)
    succ, bprobs = make_language(jax.random.PRNGKey(42))

    # ---- phase 1: train the target on the language ------------------------
    pt = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, 3e-3, 50, TARGET_STEPS), weight_decay=0.01)
    ostate = opt.init(pt)

    @jax.jit
    def target_step(pt, ostate, ids):
        def loss_fn(pt):
            cache = init_cache(cfg, BATCH, SEQ)
            logits, _ = transformer.forward(cfg, pt, ids, cache)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(lp, ids[:, 1:, None], -1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(pt)
        upd, ostate2 = opt.update(grads, ostate, pt)
        return optax.apply_updates(pt, upd), ostate2, loss

    t0 = time.perf_counter()
    for i in range(TARGET_STEPS):
        ids = sample_corpus(jax.random.fold_in(jax.random.PRNGKey(5), i),
                            succ, bprobs, BATCH, SEQ)
        pt, ostate, tloss = target_step(pt, ostate, ids)
    target_s = time.perf_counter() - t0

    # ---- phase 2: distill the EAGLE-3 head off the frozen target ----------
    ecfg = EagleConfig(hidden_size=256, target_hidden_size=256, num_heads=4,
                       num_kv_heads=2, vocab_size=V, draft_vocab_size=V,
                       intermediate_size=512, top_k=8, depth=5,
                       total_tokens=47, dtype=jnp.float32,
                       rope_theta=cfg.rope_theta)
    pe = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    tc = TrainConfig(steps=3, lr=2e-3, warmup_steps=100,
                     total_steps=HEAD_STEPS, max_len=SEQ)
    state = init_train_state(pe, tc)
    hstep = make_train_step(cfg, ecfg, tc, default_feature_layers(cfg))
    mask = jnp.ones((BATCH, SEQ), jnp.float32)
    t0 = time.perf_counter()
    for i in range(HEAD_STEPS):
        ids = sample_corpus(jax.random.fold_in(jax.random.PRNGKey(7), i),
                            succ, bprobs, BATCH, SEQ)
        state, metrics = hstep(state, pt, ids, mask)
    head_s = time.perf_counter() - t0
    pe = state.params

    # ---- phase 3: eagenerate typical vs trie-HSD --------------------------
    results = {}
    eng = EngineConfig(max_new_tokens=MAX_NEW, temperature=1.0)
    prompts = sample_corpus(jax.random.PRNGKey(9), succ, bprobs,
                            N_PROMPTS, 16)
    for mode in ("hsd", "hsd_ref", "typical", "greedy"):
        gen = make_eagle_generate(cfg, ecfg, eng, mode=mode)
        accepts, toks_n, secs = [], 0, 0.0
        for i in range(N_PROMPTS):
            r = gen(pt, pe, prompts[i], jnp.int32(16),
                    jax.random.fold_in(jax.random.PRNGKey(70), i))
            int(r.ncommit)                                # compile/warm sync
            t0 = time.perf_counter()
            r = gen(pt, pe, prompts[i], jnp.int32(16),
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
            "modes": {m: {"be": round(be, 3), "tok_s": round(tps, 1)}
                      for m, (be, tps) in results.items()},
            "uplift_hsd_vs_typical": round(be_hsd / max(be_typ, 1e-9), 3),
            "reference_uplift": 1.121,
            "regime_note": "reference's own impl shows typical>hsd on this "
                           "regime (tests/test_ref_differential.py)",
            "target_train": f"{TARGET_STEPS} steps, CE {float(tloss):.3f}, "
                            f"{target_s:.0f}s",
            "head_distill": f"{HEAD_STEPS} steps, acc0 "
                            f"{float(metrics['acc_0']):.3f}, {head_s:.0f}s",
        },
    }))


if __name__ == "__main__":
    main()
