"""Realistic-divergence oracle pair: a TRAINED tiny target LM + a
capacity-limited DISTILLED draft, so that the p/q-ratio distribution the
verifiers see resembles trained model pairs instead of smooth int8 noise.

Motivation (round-3 verdict, top item): the int8-coupled synthetic regime
(eval/synthetic.py) matches the reference's tokenwise BE *level* (~5.99) but
overshoots the published HSD uplift 4x (+22% vs +5.2%,
/root/reference/README.md:121-125) and inverts the EAGLE typical-vs-HSD
ordering (/root/reference/EAGLE-3H/README.md:58-63). The divergence SHAPE is
wrong: int8 error is a small smooth perturbation applied uniformly to every
position, while a real 0.5B-vs-14B pair diverges in a concentrated way —
near-agreement on low-entropy continuations, real disagreement at uncertain
positions where the small model's capacity runs out.

This module builds that shape from scratch, on device, with no checkpoints:

1. `make_language` — a MIXED-ENTROPY synthetic language: multi-token "words"
   (deterministic inside, like BPE pieces of a word) chained by a word-level
   Markov model with variable branching (1..branch_max successors,
   Zipf-weighted). Per-position target entropy therefore alternates between
   ~0 (inside a word) and 1-3 bits (word boundaries) — the signature
   statistic of real text that constant-entropy Markov chains (bench_eagle's
   round-3 regime) lack.
2. `train_lm` — next-token CE training of the target oracle.
3. `distill_lm` — soft-CE distillation of a SMALLER draft against the frozen
   target's distribution. The draft's divergence from the target is then a
   genuine capacity gap concentrated at hard positions, the trained-pair
   mechanism (ref: the 0.5B draft is itself a trained sibling of the 14B
   target, eval_speculative_decoding_llm.py:37,63).
4. `ratio_stats` — p/q diagnostics on draft-sampled continuations: per-token
   acceptance E[min(1, p/q)], the implied tokenwise BE at a given gamma, and
   a log(p/q) histogram — the fingerprint the round-3 verdict asked to check
   against trained pairs (the reference ships accept-length histograms in
   EAGLE-3H/results/*_info.jsonl; eval/eagle_metrics.py reads them).

Calibration knob: `scale_draft_temperature` — a single draft-side logit
temperature (lm_head scaling). It preserves the trained ratio SHAPE (which
tokens disagree) while tuning the agreement LEVEL to land tokenwise BE at
the reference's 5.99; the target is never touched, so losslessness claims
are unaffected.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig
from ..engine.kvcache import init_cache
from ..models import init_params, transformer


class MixedLanguage(NamedTuple):
    words: jax.Array    # [n_words, max_wlen] int32 token ids (padded 0)
    wlen: jax.Array     # [n_words] int32 word length (1..max_wlen)
    succ: jax.Array     # [n_words, branch_max] int32 successor word ids
    slogp: jax.Array    # [n_words, branch_max] f32 successor log-probs
                        # (-inf padded)


def make_language(key, vocab: int = 2048, n_words: int = 600,
                  max_wlen: int = 4, branch_max: int = 12,
                  det_frac: float = 0.35,
                  zipf_exp: float = 1.2) -> MixedLanguage:
    """Host-side construction (numpy; shapes are tiny).

    - word lengths ~ Zipf capped at max_wlen (most words short);
    - word token ids uniform over [1, vocab) (0 reserved as pad);
    - each word has n_succ successors: `det_frac` of words are
      DETERMINISTIC (1 successor — zero-entropy boundaries exist in real
      text too), the rest have 2..branch_max Zipf-weighted successors drawn
      with popularity skew (low word ids more likely -> realistic reuse).
    """
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
    wlen = np.minimum(1 + rng.zipf(2.0, n_words), max_wlen).astype(np.int32)
    words = rng.integers(1, vocab, (n_words, max_wlen)).astype(np.int32)
    words[np.arange(max_wlen)[None, :] >= wlen[:, None]] = 0

    n_succ = np.where(rng.random(n_words) < det_frac, 1,
                      2 + np.minimum(rng.zipf(1.6, n_words), branch_max - 2))
    n_succ = n_succ.astype(np.int32)
    # popularity-skewed successor draws: id ~ floor(n_words * u^2)
    succ = np.minimum((n_words * rng.random((n_words, branch_max)) ** 2),
                      n_words - 1).astype(np.int32)
    w = 1.0 / (1.0 + np.arange(branch_max, dtype=np.float32)) ** zipf_exp
    w = np.broadcast_to(w, (n_words, branch_max)).copy()
    w *= rng.uniform(0.5, 1.5, (n_words, branch_max)).astype(np.float32)
    w[np.arange(branch_max)[None, :] >= n_succ[:, None]] = 0.0
    w /= w.sum(axis=1, keepdims=True)
    slogp = np.where(w > 0, np.log(np.maximum(w, 1e-30)), -np.inf)
    return MixedLanguage(words=jnp.asarray(words), wlen=jnp.asarray(wlen),
                         succ=jnp.asarray(succ),
                         slogp=jnp.asarray(slogp, jnp.float32))


def sample_tokens(key, lang: MixedLanguage, batch: int, seq: int) -> jax.Array:
    """[batch, seq] int32 token stream from the word automaton (scan;
    static shapes; jit-friendly)."""
    kw, ks = jax.random.split(key)
    n_words = lang.words.shape[0]
    wid0 = jax.random.randint(kw, (batch,), 0, n_words, dtype=jnp.int32)
    pos0 = jnp.zeros((batch,), jnp.int32)

    def step(carry, k):
        wid, pos = carry
        tok = lang.words[wid, pos]
        nxt = pos + 1
        boundary = nxt >= lang.wlen[wid]
        pick = jax.random.categorical(k, lang.slogp[wid], axis=-1)
        wid2 = jnp.where(boundary, lang.succ[wid, pick], wid)
        pos2 = jnp.where(boundary, 0, nxt)
        return (wid2, pos2), tok

    _, toks = jax.lax.scan(step, (wid0, pos0), jax.random.split(ks, seq))
    return toks.T                                     # [batch, seq]


# ---------------------------------------------------------------------------
# on-device training (target CE / draft distillation), scan-batched so the
# whole run is a handful of device programs (the tunnel RTT per dispatch
# would otherwise dominate 1500-step host loops)
# ---------------------------------------------------------------------------

def _make_opt(lr: float, steps: int):
    return optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, max(10, steps // 20), steps), weight_decay=0.01)


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "batch", "seq",
                                             "lr", "total"))
def _train_chain(cfg: ModelConfig, params, opt_state, lang: MixedLanguage,
                 key, step0, *, steps: int, batch: int, seq: int,
                 lr: float, total: int):
    """`steps` CE training steps fused into one program (lax.scan)."""
    opt = _make_opt(lr, total)

    def one(carry, i):
        params, opt_state = carry
        ids = sample_tokens(jax.random.fold_in(key, i), lang, batch, seq)

        def loss_fn(p):
            cache = init_cache(cfg, batch, seq)
            logits, _ = transformer.forward(cfg, p, ids, cache)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(lp, ids[:, 1:, None], -1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, upd), opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        one, (params, opt_state), step0 + jnp.arange(steps))
    return params, opt_state, losses[-1]


def train_lm(cfg: ModelConfig, key, lang: MixedLanguage, steps: int = 1200,
             batch: int = 64, seq: int = 96, lr: float = 3e-3,
             chunk: int = 300):
    """Train a target oracle by next-token CE. Returns (params, final CE)."""
    params = init_params(cfg, key)
    opt_state = _make_opt(lr, steps).init(params)
    loss = jnp.float32(0)
    for s in range(0, steps, chunk):
        n = min(chunk, steps - s)
        params, opt_state, loss = _train_chain(
            cfg, params, opt_state, lang, jax.random.fold_in(key, 7),
            jnp.int32(s), steps=n, batch=batch, seq=seq, lr=lr, total=steps)
    return params, float(loss)


@functools.partial(jax.jit, static_argnames=("cfg_d", "cfg_t", "steps",
                                             "batch", "seq", "lr", "total"))
def _distill_chain(cfg_d: ModelConfig, cfg_t: ModelConfig, params_d,
                   params_t, opt_state, lang: MixedLanguage, key, step0, *,
                   steps: int, batch: int, seq: int, lr: float, total: int):
    opt = _make_opt(lr, total)

    def one(carry, i):
        params_d, opt_state = carry
        ids = sample_tokens(jax.random.fold_in(key, i), lang, batch, seq)
        cache_t = init_cache(cfg_t, batch, seq)
        tl, _ = transformer.forward(cfg_t, params_t, ids, cache_t)
        tp = jax.lax.stop_gradient(
            jax.nn.softmax(tl.astype(jnp.float32), -1))

        def loss_fn(p):
            cache = init_cache(cfg_d, batch, seq)
            logits, _ = transformer.forward(cfg_d, p, ids, cache)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.sum(tp * lp, -1))

        loss, grads = jax.value_and_grad(loss_fn)(params_d)
        upd, opt_state = opt.update(grads, opt_state, params_d)
        return (optax.apply_updates(params_d, upd), opt_state), loss

    (params_d, opt_state), losses = jax.lax.scan(
        one, (params_d, opt_state), step0 + jnp.arange(steps))
    return params_d, opt_state, losses[-1]


def distill_lm(cfg_d: ModelConfig, cfg_t: ModelConfig, params_t, key,
               lang: MixedLanguage, steps: int = 1200, batch: int = 64,
               seq: int = 96, lr: float = 3e-3, chunk: int = 300):
    """Distill a (smaller) draft against the frozen target's distribution.
    Returns (params_d, final soft-CE)."""
    params_d = init_params(cfg_d, key)
    opt_state = _make_opt(lr, steps).init(params_d)
    loss = jnp.float32(0)
    for s in range(0, steps, chunk):
        n = min(chunk, steps - s)
        params_d, opt_state, loss = _distill_chain(
            cfg_d, cfg_t, params_d, params_t, opt_state, lang,
            jax.random.fold_in(key, 11), jnp.int32(s), steps=n, batch=batch,
            seq=seq, lr=lr, total=steps)
    return params_d, float(loss)


def scale_draft_temperature(params_d, cfg_d: ModelConfig, tau: float):
    """Draft logit temperature as a weight transform: logits/tau via
    lm_head (or tied embedding) scaling — the ONE calibration scalar.
    tau > 1 flattens the draft (more divergence, lower BE)."""
    s = 1.0 / float(tau)
    if params_d.lm_head is not None:
        return params_d._replace(
            lm_head=jax.tree.map(lambda a: a * s, params_d.lm_head))
    if cfg_d.tie_word_embeddings:
        raise ValueError("tied draft: untie (tie_word_embeddings=False) to "
                         "use temperature calibration")
    raise ValueError("draft has no lm_head")


# ---------------------------------------------------------------------------
# diagnostics: the p/q fingerprint
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg_d", "cfg_t", "batch",
                                             "seq"))
def _ratio_probe(cfg_d: ModelConfig, cfg_t: ModelConfig, params_d, params_t,
                 lang: MixedLanguage, key, *, batch: int, seq: int):
    """On language samples x~corpus with continuation token y~q(.|x):
    per-position (log p(y) - log q(y), accept=min(1, p/q), target entropy).
    """
    kc, ky = jax.random.split(key)
    ids = sample_tokens(kc, lang, batch, seq)
    cache_d = init_cache(cfg_d, batch, seq)
    ql, _ = transformer.forward(cfg_d, params_d, ids, cache_d)
    cache_t = init_cache(cfg_t, batch, seq)
    pl, _ = transformer.forward(cfg_t, params_t, ids, cache_t)
    qlp = jax.nn.log_softmax(ql.astype(jnp.float32), -1)[:, :-1]
    plp = jax.nn.log_softmax(pl.astype(jnp.float32), -1)[:, :-1]
    y = jax.random.categorical(ky, qlp, axis=-1)        # y ~ q
    lq = jnp.take_along_axis(qlp, y[..., None], -1)[..., 0]
    lp = jnp.take_along_axis(plp, y[..., None], -1)[..., 0]
    ent = -jnp.sum(jnp.exp(plp) * plp, -1)
    acc = jnp.minimum(1.0, jnp.exp(lp - lq))
    return lp - lq, acc, ent


def ratio_stats(cfg_d: ModelConfig, cfg_t: ModelConfig, params_d, params_t,
                lang: MixedLanguage, key, gamma: int = 10,
                batch: int = 64, seq: int = 96) -> dict:
    """Summary of the divergence fingerprint + the implied tokenwise BE
    (iid-alpha model: BE = (1 - a^(g+1)) / (1 - a)) for quick calibration
    without running the engine."""
    lr, acc, ent = _ratio_probe(cfg_d, cfg_t, params_d, params_t, lang, key,
                                batch=batch, seq=seq)
    lr, acc, ent = (np.asarray(v).ravel() for v in (lr, acc, ent))
    a = float(acc.mean())
    be = (1 - a ** (gamma + 1)) / (1 - a) if a < 1 else gamma + 1
    hist, _ = np.histogram(np.clip(lr, -8, 2), bins=10, range=(-8, 2))
    return {
        "alpha": round(a, 4),
        "implied_tokenwise_be": round(be, 3),
        "logratio_mean": round(float(lr.mean()), 3),
        "logratio_p05": round(float(np.percentile(lr, 5)), 3),
        "frac_hard_disagree": round(float((lr < -1.0).mean()), 4),
        "target_entropy_mean": round(float(ent.mean()), 3),
        "target_entropy_frac_low": round(float((ent < 0.1).mean()), 3),
        "logratio_hist_-8_2": hist.tolist(),
    }
