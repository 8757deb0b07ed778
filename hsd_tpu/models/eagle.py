"""EAGLE-3 feature-level draft head + trie drafting, TPU-native.

Re-derivation of the reference's `EAGLE-3H/eagle/model/cnets.py`:
  * the head is ONE fused decoder layer whose attention consumes
    concat(norm(token_emb), norm(hidden)) — 2*hidden -> qkv (cnets.py:209-212,
    :387-460);
  * `fc: 3*target_hidden -> hidden` fuses three target hidden states
    (cnets.py:532-534);
  * a reduced draft vocabulary with d2t (draft->target id offset) and t2d
    (target-vocab membership mask) buffers (cnets.py:538-541);
  * trie drafting = depth-step beam search, top_k per node, cumulative
    log-probs, then a global top-(total_tokens) cut over all scored nodes
    (topK_genrate, cnets.py:670-827).

TPU-first design: the beam loop is a `lax.scan` with STATIC shapes — the
reference grows its tree mask every step (torch.cat), here each beam level
writes K fixed KV slots and carries a [K, depth*K] ancestor mask; the final
tree closure / leaf-path extraction are masked scans instead of Python loops
over .tolist() (cnets.py:776-817).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.linear import apply_linear


@dataclasses.dataclass(frozen=True)
class EagleConfig:
    hidden_size: int
    target_hidden_size: int
    num_heads: int
    num_kv_heads: int
    vocab_size: int          # target vocab
    draft_vocab_size: int    # reduced draft vocab (== vocab_size when full)
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # Llama-3.1 frequency-dependent RoPE scaling tuple (see
    # ModelConfig.rope_scaling); heads trained on scaled-rope targets
    # (e.g. EAGLE3-LLaMA3.1) must rotate identically
    rope_scaling: tuple = None
    intermediate_size: int = 0
    top_k: int = 10
    depth: int = 6
    total_tokens: int = 59   # nodes in the final trie EXCLUDING the root
    dtype: jnp.dtype = jnp.bfloat16
    # 3 = EAGLE-3 fused head (cnets.py); 1 = EAGLE-1/2 legacy head
    # (cnets1.py: hidden = fc(cat(emb, hidden)) with bias, then a standard
    # decoder layer whose layer-0 input_layernorm is Identity, and the
    # TARGET lm_head applied without an extra norm)
    version: int = 3

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_json(path: str, **overrides) -> "EagleConfig":
        """Load an EAGLE head config JSON (the reference's EConfig files,
        eagle/model/configs.py / train/*_config.json)."""
        import json

        with open(path) as f:
            c = json.load(f)
        d = dict(
            hidden_size=c["hidden_size"],
            target_hidden_size=c.get("target_hidden_size", c["hidden_size"]),
            num_heads=c["num_attention_heads"],
            num_kv_heads=c.get("num_key_value_heads",
                               c["num_attention_heads"]),
            vocab_size=c["vocab_size"],
            draft_vocab_size=c.get("draft_vocab_size", c["vocab_size"]),
            rms_norm_eps=c.get("rms_norm_eps", 1e-5),
            rope_theta=c.get("rope_theta", 500000.0),
            intermediate_size=c.get("intermediate_size", 0),
        )
        d.update(overrides)
        return EagleConfig(**d)


class EagleParams(NamedTuple):
    embed: jax.Array        # [V, D] frozen target embeddings
    fc: jax.Array           # [3*Dt, D] (v3) / [2*D, D] (v1)
    ln_input: jax.Array     # [D]   input_layernorm (token emb branch)
    ln_hidden: jax.Array    # [D]   hidden_norm (feature branch)
    wq: jax.Array           # [2D, H*hd]
    wk: jax.Array           # [2D, Hkv*hd]
    wv: jax.Array           # [2D, Hkv*hd]
    wo: jax.Array           # [H*hd, D]
    ln_post: jax.Array      # [D]
    wgate: jax.Array        # [D, F]
    wup: jax.Array          # [D, F]
    wdown: jax.Array        # [F, D]
    norm: jax.Array         # [D] final norm before lm_head
    lm_head: jax.Array      # [D, Vd]
    d2t: jax.Array          # [Vd] int32 offset: target_id = draft_id + d2t
    t2d: jax.Array          # [V] bool membership
    fc_b: Any = None        # [D] fc bias (v1 legacy head only)


def init_eagle_params(cfg: EagleConfig, key: jax.Array) -> EagleParams:
    D, Dt = cfg.hidden_size, cfg.target_hidden_size
    F = cfg.intermediate_size or 4 * D
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = iter(jax.random.split(key, 12))

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[0] ** -0.5
                ).astype(cfg.dtype)

    return EagleParams(
        embed=dense(next(ks), (cfg.vocab_size, D)),
        fc=dense(next(ks), (3 * Dt, D)),
        ln_input=jnp.ones((D,), jnp.float32),
        ln_hidden=jnp.ones((D,), jnp.float32),
        wq=dense(next(ks), (2 * D, H * hd)),
        wk=dense(next(ks), (2 * D, Hkv * hd)),
        wv=dense(next(ks), (2 * D, Hkv * hd)),
        wo=dense(next(ks), (H * hd, D)),
        ln_post=jnp.ones((D,), jnp.float32),
        wgate=dense(next(ks), (D, F)),
        wup=dense(next(ks), (D, F)),
        wdown=dense(next(ks), (F, D)),
        norm=jnp.ones((D,), jnp.float32),
        lm_head=dense(next(ks), (D, cfg.draft_vocab_size)),
        d2t=jnp.zeros((cfg.draft_vocab_size,), jnp.int32),
        t2d=jnp.ones((cfg.vocab_size,), bool),
    )


def init_eagle_params_v1(cfg: EagleConfig, key: jax.Array,
                         target_lm_head: jax.Array = None) -> EagleParams:
    """Random init for the EAGLE-1/2 legacy head (cnets1.py geometry)."""
    D = cfg.hidden_size
    F = cfg.intermediate_size or 4 * D
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = iter(jax.random.split(key, 12))

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * shape[0] ** -0.5
                ).astype(cfg.dtype)

    lm = target_lm_head if target_lm_head is not None \
        else dense(next(ks), (D, cfg.draft_vocab_size))
    return EagleParams(
        embed=dense(next(ks), (cfg.vocab_size, D)),
        fc=dense(next(ks), (2 * D, D)),
        fc_b=jnp.zeros((D,), cfg.dtype),
        ln_input=jnp.ones((D,), jnp.float32),   # unused (Identity in v1)
        ln_hidden=jnp.ones((D,), jnp.float32),  # unused
        wq=dense(next(ks), (D, H * hd)),
        wk=dense(next(ks), (D, Hkv * hd)),
        wv=dense(next(ks), (D, Hkv * hd)),
        wo=dense(next(ks), (H * hd, D)),
        ln_post=jnp.ones((D,), jnp.float32),
        wgate=dense(next(ks), (D, F)),
        wup=dense(next(ks), (D, F)),
        wdown=dense(next(ks), (F, D)),
        norm=jnp.ones((D,), jnp.float32),       # unused (target head direct)
        lm_head=lm,
        d2t=jnp.zeros((cfg.draft_vocab_size,), jnp.int32),
        t2d=jnp.ones((cfg.vocab_size,), bool),
    )


def quantize_eagle_params(params: EagleParams, bits: int = 8,
                          group_size: int = 128) -> EagleParams:
    """Weight-only quantize the draft head's matmuls (symmetric GPTQ layout,
    ops/linear.quantize) so the beam rides the Pallas int8/int4 kernels.

    The EAGLE beam is HBM-bound on its own weight stream: at 8B geometry the
    absorb + 6 level forwards re-read ~5.8 GB of bf16 head weights per
    block, measured 7.1 ms of the 7.4 ms build_trie cost
    (docs/BENCHMARKS.md r4) — the trie bookkeeping is 0.27 ms. int8 halves
    the stream. LOSSLESS BY CONSTRUCTION: the head only PROPOSES (its
    deterministic top-k becomes the trie's one-hot q); the target-side
    verification reconstructs the target distribution no matter how the
    proposals were produced, so quantizing the head can change acceptance
    RATES only, never the output law. The reference has no counterpart (its
    head runs bf16; SURVEY §2.6 — the kernels exist only on our side).
    embed / norms / d2t / t2d stay dense."""
    import math

    from ..ops.linear import quantize as _q

    def qz(w):
        gs = math.gcd(w.shape[0], group_size)   # tiny test geometries
        return _q(jnp.asarray(w, jnp.float32), bits=bits,
                  group_size=gs, symmetric=True)

    return params._replace(
        fc=qz(params.fc), wq=qz(params.wq), wk=qz(params.wk),
        wv=qz(params.wv), wo=qz(params.wo), wgate=qz(params.wgate),
        wup=qz(params.wup), wdown=qz(params.wdown),
        lm_head=qz(params.lm_head))


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            * w).astype(x.dtype)


def _rope(x, positions, theta, scaling=None):
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if scaling is not None:
        # Llama-3.1 frequency-dependent scaling (transformer._rope)
        factor, lo_f, hi_f, orig = scaling
        smooth = jnp.clip((orig / (2.0 * jnp.pi / freqs) - lo_f)
                          / (hi_f - lo_f), 0.0, 1.0)
        freqs = (1.0 - smooth) * freqs / factor + smooth * freqs
    ang = positions[..., None].astype(jnp.float32) * freqs
    cos, sin = jnp.cos(ang)[:, :, None, :], jnp.sin(ang)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           -1).astype(x.dtype)


class EagleKV(NamedTuple):
    k: jax.Array       # [B, S, Hkv, hd]
    v: jax.Array
    length: jax.Array  # int32
    start: jax.Array   # int32 — dead left-pad slots [0, start)


def init_eagle_kv(cfg: EagleConfig, batch: int, max_len: int) -> EagleKV:
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return EagleKV(jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype),
                   jnp.int32(0), jnp.int32(0))


def head_forward(cfg: EagleConfig, p: EagleParams, token_emb: jax.Array,
                 hidden: jax.Array, kv: EagleKV, positions: jax.Array,
                 kv_mask: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, EagleKV]:
    """One fused-decoder-layer forward.

    token_emb: [B, T, D] embeddings of the (shifted) tokens;
    hidden:    [B, T, D] feature branch (target features through fc, or the
               head's own previous outputs during beam expansion);
    positions: [B, T] RoPE positions;
    kv_mask:   [B, T, S] optional attention mask override (True = attend);
               default causal-by-slot. Returns (out_hidden [B,T,D], kv').
    """
    B, T, D = token_emb.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.version == 1:
        # legacy head: hidden = fc(cat(emb, hidden)) + bias; layer-0
        # input_layernorm is Identity (cnets1.py:392-401, 523-623)
        fused = apply_linear(p.fc, jnp.concatenate([token_emb, hidden], -1),
                             p.fc_b)
        residual = fused
        x = fused
    else:
        residual = hidden
        x = jnp.concatenate([_rms(token_emb, p.ln_input, cfg.rms_norm_eps),
                             _rms(hidden, p.ln_hidden, cfg.rms_norm_eps)], -1)
    q = apply_linear(p.wq, x).reshape(B, T, H, hd)
    k = apply_linear(p.wk, x).reshape(B, T, Hkv, hd)
    v = apply_linear(p.wv, x).reshape(B, T, Hkv, hd)
    q = _rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
    k = _rope(k, positions, cfg.rope_theta, cfg.rope_scaling)

    S = kv.k.shape[1]
    kbuf = jax.lax.dynamic_update_slice(kv.k, k.astype(kv.k.dtype),
                                        (0, kv.length, 0, 0))
    vbuf = jax.lax.dynamic_update_slice(kv.v, v.astype(kv.v.dtype),
                                        (0, kv.length, 0, 0))
    # GQA as a grouped einsum over [kv_head, rep] — NEVER materialize the
    # repeated K/V (jnp.repeat rewrote rep x the cache bytes per step; same
    # fix as transformer._attention, measured there as the dominant
    # long-context cost). Head h maps to (kv_head h//rep, rep h%rep), the
    # jnp.repeat ordering.
    rep = H // Hkv
    qg = q.reshape(B, T, Hkv, rep, hd)
    scores = jnp.einsum("btkrd,bskd->bkrts", qg, kbuf,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    if kv_mask is None:
        slot = jnp.arange(S)[None, None, None, None, :]
        qslot = (kv.length + jnp.arange(T))[None, None, None, :, None]
        mask = (slot <= qslot) & (slot >= kv.start)
    else:
        mask = kv_mask[:, None, None, :, :]
    scores = jnp.where(mask, scores, -1e30)
    att = jnp.einsum("bkrts,bskd->btkrd",
                     jax.nn.softmax(scores, -1).astype(q.dtype), vbuf)
    out = residual + apply_linear(p.wo, att.reshape(B, T, H * hd))
    h = _rms(out, p.ln_post, cfg.rms_norm_eps)
    out = out + apply_linear(p.wdown,
                             jax.nn.silu(apply_linear(p.wgate, h))
                             * apply_linear(p.wup, h))
    return out, EagleKV(kbuf, vbuf, kv.length + T, kv.start)


def draft_logp(cfg: EagleConfig, p: EagleParams, hidden: jax.Array) -> jax.Array:
    """log-softmax over the DRAFT vocab (cnets.py:700). The v1 legacy head
    applies the target lm_head directly (no extra norm, cnets1 topK path)."""
    h = hidden if cfg.version == 1 else _rms(hidden, p.norm, cfg.rms_norm_eps)
    logits = apply_linear(p.lm_head, h)
    return jax.nn.log_softmax(logits.astype(jnp.float32), -1)


class Trie(NamedTuple):
    """A drafted token trie (the reference's topK_genrate outputs,
    cnets.py:825-827), fixed shapes with N = total_tokens."""

    draft_tokens: jax.Array      # [N+1] int32, col 0 = the root (last committed)
    parents: jax.Array           # [N+1] int32 parent node index (0 for level-0; -1 root)
    tree_mask: jax.Array         # [N+1, N+1] bool ancestor-closure (incl. self)
    position_ids: jax.Array      # [N+1] int32 depth of each node
    retrieve_indices: jax.Array  # [N+1, depth+2] int32 leaf->root paths, -1 pad
    num_paths: jax.Array         # int32 number of valid leaf paths
    path_len: jax.Array          # [N+1] int32 valid length of each path row


def build_trie(cfg: EagleConfig, p: EagleParams, target_features: jax.Array,
               tokens: jax.Array, kv: EagleKV, prefix_len: jax.Array,
               root_token: jax.Array) -> Tuple[Trie, EagleKV]:
    """Beam-search the draft trie (reference topK_genrate, cnets.py:670-827).

    target_features: [1, T, 3*Dt] concatenated target hidden states for the
      newly accepted tokens; tokens: [1, T] the corresponding (shifted) token
      ids; kv holds the head's persistent prefix KV (stable_kv reuse,
      cnets.py:690-696); prefix_len = valid positions already in kv;
      root_token: the newest committed token (trie root).

    Returns (Trie, kv') where kv' contains prefix + T entries (the trie-region
    KV written during beam expansion is scratch past kv'.length).
    """
    K, depth, N = cfg.top_k, cfg.depth, cfg.total_tokens
    # 1) absorb the new accepted tokens into the head state. v3 fuses the
    # 3-layer feature stream through fc here; v1's fc runs inside
    # head_forward on cat(emb, hidden), so features pass through raw.
    if cfg.version == 1:
        feat = target_features.astype(cfg.dtype)
    else:
        feat = apply_linear(p.fc, target_features.astype(cfg.dtype))
    emb = jnp.take(p.embed, tokens, axis=0).astype(cfg.dtype)
    T = tokens.shape[1]
    pos = prefix_len + jnp.arange(T)[None, :] - kv.start
    out_hidden, kv = head_forward(cfg, p, emb, feat, kv, pos)
    last_hidden = out_hidden[:, -1]                      # [1, D]
    kv_stable = kv                                       # checkpoint for reuse

    logp = draft_logp(cfg, p, last_hidden)[0]            # [Vd]
    top_p, top_i = jax.lax.top_k(logp, K)
    root_children = (top_i + p.d2t[top_i]).astype(jnp.int32)

    # beam state: K current nodes
    scores0 = top_p                                       # [K] cumulative logp
    tokens0 = root_children                               # [K] target-vocab ids
    hidden0 = jnp.broadcast_to(last_hidden, (K, last_hidden.shape[-1]))
    # ancestor mask over the trie KV region [depth*K]; level i writes slots
    # [i*K, (i+1)*K)
    anc0 = jnp.zeros((K, depth * K), bool)

    base_len = kv.length                                  # trie region start

    def level(carry, i):
        kvk, hid, tok, sc, anc = carry
        # attend: prefix + own ancestors among trie slots + self slot.
        # Level i's beam nodes occupy trie slots [i*K, (i+1)*K).
        S = kvk.k.shape[1]
        slot = jnp.arange(S)[None, :]
        prefix_mask = jnp.broadcast_to((slot < base_len) & (slot >= kvk.start),
                                       (K, S))
        trie_slot = jnp.broadcast_to(slot - base_len, (K, S))
        anc_mask = jnp.take_along_axis(
            anc, jnp.clip(trie_slot, 0, depth * K - 1), axis=1) \
            & (trie_slot >= 0) & (trie_slot < depth * K)
        self_mask = trie_slot == (i * K + jnp.arange(K)[:, None])
        mask = (prefix_mask | anc_mask | self_mask)[None]  # [1, K, S]

        emb_t = jnp.take(p.embed, tok, axis=0)[None].astype(cfg.dtype)
        posb = (prefix_len + T + i - kvk.start) * jnp.ones((1, K), jnp.int32)
        kv_in = EagleKV(kvk.k, kvk.v, base_len + i * K, kvk.start)
        out, kv_out = head_forward(cfg, p, emb_t, hid[None], kv_in, posb, mask)
        out = out[0]                                      # [K, D]

        logp = draft_logp(cfg, p, out)                    # [K, Vd]
        ctop_p, ctop_i = jax.lax.top_k(logp, K)           # [K, K]
        cu = ctop_p + sc[:, None]                         # [K, K] cumulative
        sel_p, sel_i = jax.lax.top_k(cu.reshape(-1), K)   # new beam
        parent_row = (sel_i // K).astype(jnp.int32)
        new_tok = ctop_i.reshape(-1)[sel_i]
        new_tok = (new_tok + p.d2t[new_tok]).astype(jnp.int32)
        new_hid = out[parent_row]
        # ancestors of new node = ancestors of its parent + the parent's slot
        parent_slot = i * K + parent_row
        new_anc = anc[parent_row] | jax.nn.one_hot(parent_slot, depth * K,
                                                   dtype=bool)
        ys = dict(cu_scores=cu, cand_tokens=ctop_i)
        return (kv_out, new_hid, new_tok, sel_p, new_anc), ys

    (kv_end, _, _, _, _), ys = jax.lax.scan(
        level, (kv, hidden0, tokens0, scores0, anc0), jnp.arange(depth))

    # ---- flatten all scored nodes: level 0 has K, levels 1..depth have K*K
    # flat layout (matches reference ordering: scores_list/ss_token concat):
    #   [K level-0] ++ [K*K level-1] ++ ... ++ [K*K level-depth]
    lvl_scores = ys["cu_scores"].reshape(depth * K * K)
    flat_scores = jnp.concatenate([scores0, lvl_scores])
    lvl_tokens = ys["cand_tokens"].reshape(depth * K * K)
    lvl_tokens = (lvl_tokens + p.d2t[lvl_tokens]).astype(jnp.int32)
    flat_tokens = jnp.concatenate([tokens0.astype(jnp.int32), lvl_tokens])

    # parent (in flat index space) of every scored node:
    #   level-0 nodes: parent = -1 (root);
    #   level-(l+1) candidate in cell [j, k] of cu_scores[l]: parent is beam
    #   row j entering level l, whose flat id is:
    #     l == 0 -> j (level-0 node j)
    #     l >= 1 -> K + (l-1)*K*K + sel_i  (the cell it was selected from)
    def beam_flat_ids(cu, l):
        _, sel_i = jax.lax.top_k(cu.reshape(-1), K)
        return (K + l * K * K + sel_i).astype(jnp.int32)

    beam_ids = jax.vmap(beam_flat_ids)(ys["cu_scores"],
                                       jnp.arange(depth))  # [depth, K]
    prev_beam = jnp.concatenate([jnp.arange(K, dtype=jnp.int32)[None],
                                 beam_ids[:-1]])           # [depth, K]
    lvl_parents = jnp.broadcast_to(prev_beam[:, :, None],
                                   (depth, K, K)).reshape(depth * K * K)
    flat_parents = jnp.concatenate(
        [jnp.full((K,), -1, jnp.int32), lvl_parents])

    # ---- global top-N cut, sorted ascending (reference :763-766)
    M = flat_scores.shape[0]
    _, top_idx = jax.lax.top_k(flat_scores, N)
    top_idx = jnp.sort(top_idx)

    sel_tokens = flat_tokens[top_idx]
    sel_parent_flat = flat_parents[top_idx]
    # map flat parent -> position in the selected set (+1 for root at col 0);
    # a parent not selected => node orphaned; the reference assumes beam
    # parents always score higher (monotone cumulative logp) so parents of
    # selected nodes are selected. searchsorted gives the position.
    pos_in_sel = jnp.searchsorted(top_idx, sel_parent_flat)
    parent_node = jnp.where(sel_parent_flat < 0, 0, pos_in_sel + 1)

    draft_tokens = jnp.concatenate([root_token[None].astype(jnp.int32),
                                    sel_tokens])

    # ---- ancestor closure [N+1, N+1] (reference :776-781, as a scan)
    def closure_row(mat, i):
        row = mat[parent_node[i]] | jax.nn.one_hot(i + 1, N + 1, dtype=bool)
        mat = mat.at[i + 1].set(row)
        return mat, None

    mat0 = jnp.zeros((N + 1, N + 1), bool).at[0, 0].set(True)
    tree_mask, _ = jax.lax.scan(closure_row, mat0, jnp.arange(N))
    position_ids = jnp.sum(tree_mask, axis=1).astype(jnp.int32) - 1

    # ---- leaf paths (retrieve_indices, reference :789-817)
    is_parent = jnp.zeros((N + 1,), bool).at[parent_node].set(True)
    # node 0 (root) is always a parent of level-0 nodes
    is_parent = is_parent.at[0].set(True)
    is_leaf = ~is_parent
    leaf_idx_all = jnp.arange(N + 1)

    # walk parents from every node; rows for non-leaves are masked later
    def walk(node):
        L = cfg.depth + 2

        def step(carry, _):
            cur = carry
            nxt = jnp.where(cur > 0, parent_node[jnp.clip(cur - 1, 0, N - 1)],
                            -1)
            return nxt, cur

        _, chain = jax.lax.scan(step, node, None, length=L)
        # chain = [node, parent, grandparent, ...]; reverse into root-first
        d = position_ids[node]
        j = jnp.arange(L)
        path = jnp.where(j <= d, chain[jnp.clip(d - j, 0, L - 1)], -1)
        return path.astype(jnp.int32)

    paths = jax.vmap(walk)(leaf_idx_all)                  # [N+1, depth+2]
    path_len = position_ids + 1
    # order rows lexicographically by path indices with -1 (and non-leaf
    # rows) mapped large — the reference's custom_sort for the sampling
    # verifiers (cnets.py:809-817); the prefix-sharing round order of
    # trie-HSD depends on it. Lexsort = stable argsort from last column.
    BIG = N + 5
    keys_m = jnp.where(paths < 0, BIG, paths)
    keys_m = jnp.where(is_leaf[:, None], keys_m, BIG)
    order = jnp.arange(N + 1)
    Lp = paths.shape[1]
    for j in range(Lp - 1, -1, -1):
        order = order[jnp.argsort(keys_m[order, j], stable=True)]
    retrieve = paths[order]
    retrieve = jnp.where((jnp.arange(N + 1) < jnp.sum(is_leaf))[:, None],
                         retrieve, -1)
    trie = Trie(draft_tokens=draft_tokens,
                parents=jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                         parent_node]),
                tree_mask=tree_mask,
                position_ids=position_ids,
                retrieve_indices=retrieve,
                num_paths=jnp.sum(is_leaf).astype(jnp.int32),
                path_len=path_len[order],
                )
    return trie, kv_stable
