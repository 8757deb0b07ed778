"""Training-time quality probes for the EAGLE draft head.

Re-derivations of the reference trainer's diagnostics
(EAGLE-3H/eagle/train/main.py):

  * `top_k_accuracy` — fraction of masked positions whose target-argmax token
    is inside the head's top-k prediction (main.py:345-379, `top_accuracy`
    at :216-229);
  * `getkacc` — k-step greedy ROLLOUT accuracy: from a committed prefix the
    head rolls out `max_length` tokens feeding back its own hidden outputs,
    and kacc_k is the fraction of rollouts whose first k+1 tokens all match
    the frozen target's argmax chain (main.py:241-292). This is the probe
    that predicts block efficiency before any engine run.

TPU-first formulation: the reference re-runs a full head forward per prefix
position (a Python loop of O(T) forwards, :270-275). Here ONE causal forward
computes every prefix's step-0 state, and the rollouts for all sampled
prefixes advance in lockstep as batch rows — each probe writes its rollout
KV into a shared scratch region and masks the prefix to its own length, so
the whole probe is `max_length` batched head forwards regardless of how many
prefixes are tested.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eagle import (EagleConfig, EagleKV, EagleParams, head_forward,
                            init_eagle_kv)
from ..ops.linear import apply_linear


def top_k_accuracy(logits_pred: jax.Array, logits_tgt: jax.Array,
                   loss_mask: jax.Array, ks: Sequence[int] = (1, 2, 3)):
    """Per-k accuracies over masked positions (ref main.py:216-229,345-379).

    logits_pred/logits_tgt: [..., V]; loss_mask broadcastable to the leading
    dims. Returns {f'top{k}_acc': scalar}."""
    tgt = jnp.argmax(logits_tgt, -1)
    kmax = max(ks)
    _, topi = jax.lax.top_k(logits_pred, kmax)            # [..., kmax]
    hit = topi == tgt[..., None]                          # [..., kmax]
    m = loss_mask.astype(jnp.float32)
    denom = jnp.sum(m) + 1e-6
    out = {}
    for k in ks:
        acc = jnp.sum(jnp.any(hit[..., :k], -1) * m) / denom
        out[f"top{k}_acc"] = acc
    return out


def _rollout(ecfg: EagleConfig, params: EagleParams, hidden: jax.Array,
             input_ids: jax.Array, probes: jax.Array, max_length: int):
    """Greedy head rollouts from every probe prefix, batched.

    hidden [B, T, D] target hidden states, input_ids [B, T]; probes [Np]
    prefix lengths (1 <= p <= T-1). Returns rolled tokens [B, Np, max_length]
    and the target's argmax ids [B, T-1] (tgt[t] = argmax head(hidden[t+1]))."""
    B, T, D = hidden.shape
    Np = probes.shape[0]
    emb = jnp.take(params.embed, input_ids, axis=0).astype(ecfg.dtype)

    # one causal forward over all pairs (emb(ids[t+1]), hidden[t])
    S = T + max_length + 1
    kv = init_eagle_kv(ecfg, B, S)
    pos = jnp.broadcast_to(jnp.arange(T - 1)[None, :], (B, T - 1))
    out_full, kv_full = head_forward(ecfg, params, emb[:, 1:],
                                     hidden[:, :-1].astype(ecfg.dtype),
                                     kv, pos)

    def head_ids(h):
        i = jnp.argmax(apply_linear(params.lm_head, h).astype(jnp.float32),
                       -1)
        return (i + params.d2t[i]).astype(jnp.int32)      # target-vocab ids

    tgt_ids = head_ids(hidden[:, 1:].astype(ecfg.dtype))  # [B, T-1]

    # probe rows: (b, p) -> batch row b * Np + i; prefix pairs [0, p) shared
    # via broadcast, rollout pairs written to scratch slots [T-1+j]
    R = B * Np
    kb = jnp.repeat(kv_full.k, Np, axis=0)                # [R, S, Hkv, hd]
    vb = jnp.repeat(kv_full.v, Np, axis=0)
    p_row = jnp.tile(probes, (B,))                        # [R]
    # step-0 token comes from the full forward's output at pair p-1
    out0 = jnp.repeat(out_full, Np, axis=0)               # [R, T-1, D]
    h0 = jnp.take_along_axis(
        out0, (p_row - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    t0 = head_ids(h0[:, None].astype(ecfg.dtype))[:, 0]

    slot = jnp.arange(S)[None, :]

    def step(carry, j):
        kbuf, vbuf, tok, hid = carry
        # pair (emb(tok), hid) at absolute position p-1+j+1; KV scratch slot
        # T-1+j; attends prefix pairs [0, p) + scratch pairs [T-1, T-1+j]
        mask = (slot < p_row[:, None]) | \
               ((slot >= T - 1) & (slot <= T - 1 + j))
        kv_in = EagleKV(kbuf, vbuf, jnp.int32(T - 1 + j), jnp.int32(0))
        posj = (p_row + j)[:, None].astype(jnp.int32)
        emb_t = jnp.take(params.embed, tok, axis=0)[:, None].astype(ecfg.dtype)
        out, kv_out = head_forward(ecfg, params, emb_t, hid[:, None], kv_in,
                                   posj, mask[:, None, :])
        h = out[:, 0]
        nxt = head_ids(h[:, None].astype(ecfg.dtype))[:, 0]
        return (kv_out.k, kv_out.v, nxt, h), tok

    (_, _, last, _), toks = jax.lax.scan(
        step, (kb, vb, t0, h0), jnp.arange(max_length - 1))
    rolled = jnp.concatenate([toks, last[None]], axis=0)  # [max_len, R]
    rolled = jnp.moveaxis(rolled, 0, 1).reshape(B, Np, max_length)
    return rolled, tgt_ids


def getkacc(ecfg: EagleConfig, params: EagleParams, hidden: jax.Array,
            input_ids: jax.Array, loss_mask: jax.Array,
            max_length: int = 5, max_probes: int = 16,
            probes: Optional[np.ndarray] = None) -> np.ndarray:
    """k-step rollout accuracy (ref main.py:241-292 `getkacc`).

    Accounting mirrors the reference loop exactly: per (row, prefix), step k
    is counted iff every loss_mask[p..p+k] is set and the chain reached it;
    on the first mismatch all remaining steps count as tested-and-wrong.
    Returns kacc [max_length] floats (NaN-free; 0 where nothing was tested)."""
    B, T, _ = hidden.shape
    if probes is None:
        hi = max(T - max_length - 1, 2)
        probes = np.unique(np.linspace(1, hi, min(max_probes, hi),
                                       dtype=np.int32))
    probes = jnp.asarray(probes, jnp.int32)
    rolled, tgt = jax.jit(
        _rollout, static_argnums=(0, 5))(ecfg, params, hidden, input_ids,
                                         probes, max_length)
    rolled = np.asarray(rolled)
    tgt = np.asarray(tgt)
    lm = np.asarray(loss_mask)
    pr = np.asarray(probes)
    total = np.zeros(max_length, np.int64)
    correct = np.zeros(max_length, np.int64)
    for b in range(B):
        for i, p in enumerate(pr):
            for k in range(max_length):
                if p + k >= T or lm[b, p + k] == 0:
                    break
                total[k] += 1
                if rolled[b, i, k] == tgt[b, p + k - 1]:
                    correct[k] += 1
                else:
                    total[k + 1:] += 1
                    break
    return np.where(total > 0, correct / np.maximum(total, 1), 0.0)


def make_kacc_probe(cfg_t, ecfg: EagleConfig, max_length: int = 5,
                    max_probes: int = 16):
    """Build `probe(params_e, params_t, input_ids, loss_mask) -> kacc` — the
    between-epoch rollout-accuracy probe the reference runs on <=10 test
    batches (main.py:420-424). Computes the frozen target's hidden stream
    (v1: final hidden; v3: fc over the 3-layer feature stream) and runs
    `getkacc`."""
    from ..engine.eagle_engine import default_feature_layers
    from ..engine.kvcache import init_cache
    from ..models import transformer

    feat_layers = (-1,) if ecfg.version == 1 else default_feature_layers(cfg_t)

    @jax.jit
    def features(params_t, input_ids):
        B, T = input_ids.shape
        cache = init_cache(cfg_t, B, T)
        _, _, feats = transformer.forward(cfg_t, params_t, input_ids, cache,
                                          feature_layers=feat_layers)
        return feats

    def probe(params_e: EagleParams, params_t, input_ids, loss_mask):
        feats = features(params_t, input_ids)
        if ecfg.version == 1:
            hidden = feats
        else:
            hidden = apply_linear(params_e.fc, feats.astype(ecfg.dtype))
        kacc = getkacc(ecfg, params_e, hidden, input_ids, loss_mask,
                       max_length=max_length, max_probes=max_probes)
        return {f"kacc_{i}": float(v) for i, v in enumerate(kacc)}

    return probe
