"""EAGLE decode orchestration — the TPU-native `eagenerate`
(ref: EAGLE-3H/eagle/model/ea_model.py:194-366):

    prefill target (collect feature stream) -> trie draft (models/eagle.py)
    -> ONE tree-masked target forward over the trie -> trie verification
    (greedy / typical / trie-HSD) -> path KV compaction -> next trie.

Static-shape invariants:
  * the head re-absorbs a FIXED window of (feature, token) pairs each block
    (idempotent rewrites), replacing the reference's variable-length
    `input_ids[:, kv_len:]` catch-up (cnets.py:690-696);
  * a features ring buffer keeps the target features of every committed
    position, scatter-updated from the accepted tree path;
  * the whole generate is one lax.while_loop — one host sync per call.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..models.eagle import (EagleConfig, EagleParams, Trie, build_trie,
                            init_eagle_kv)
from ..ops.sampling import process_logits, processor, sample
from ..verify.trie import (verify_trie_greedy, verify_trie_hsd,
                           verify_trie_typical)
from .kvcache import (compact_path, compact_path_batched,
                      compact_path_staged, init_cache)


class EagleGenerateResult(NamedTuple):
    tokens: jax.Array
    length: jax.Array
    prompt_len: jax.Array
    blocks: jax.Array
    accepts: jax.Array      # [max_blocks] accept_length per block
    draft_lens: jax.Array   # [max_blocks] drafted tokens per block (N)
    ncommit: jax.Array
    # [max_blocks] valid length of the block's best path row (root incl.);
    # with accepts it yields the paper's per-position acceptance rates alpha
    # (eval/eagle_metrics.alpha_from_blocks; ref evaluation/alpha.py:16-30)
    path_lens: jax.Array = jnp.zeros(())


def default_feature_layers(cfg: ModelConfig) -> Tuple[int, int, int]:
    """The reference taps target layer inputs {2, L//2, L-3}
    (modeling_llama_kv.py:1138)."""
    L = cfg.num_layers
    return (min(2, L - 1), L // 2, max(L - 3, 0))


def autotune_total_tokens(cfg_t: ModelConfig, ecfg: EagleConfig,
                          engine: EngineConfig, params_t, params_e,
                          prompt, prompt_len, key,
                          candidates=(23, 47, 59), mode: str = "hsd"):
    """Pick the trie size by timing short generates — the reference's
    total_token auto-tune (ea_model.py:143-164 times forward passes per
    candidate and keeps the fastest). Returns (best EagleConfig, stats)."""
    import dataclasses as _dc
    import time as _time

    short = _dc.replace(engine, max_new_tokens=min(32, engine.max_new_tokens))
    stats = {}
    best, best_tps = None, -1.0
    for tt in candidates:
        ecfg_c = _dc.replace(ecfg, total_tokens=tt)
        gen = make_eagle_generate(cfg_t, ecfg_c, short, mode=mode)
        res = gen(params_t, params_e, prompt, prompt_len, key)  # compile+warm
        res.tokens.block_until_ready()
        t0 = _time.perf_counter()
        res = gen(params_t, params_e, prompt, prompt_len,
                  jax.random.fold_in(key, 1))
        res.tokens.block_until_ready()
        tps = int(res.ncommit) / (_time.perf_counter() - t0)
        stats[tt] = tps
        if tps > best_tps:
            best, best_tps = ecfg_c, tps
    return best, stats


def make_eagle_block(cfg_t: ModelConfig, ecfg: EagleConfig,
                     engine: EngineConfig, mode: str = "hsd",
                     target_forward=None, static_tree=None):
    """Factory for the REUSABLE single-slot pieces of the eagenerate loop:
    returns `(prefill, block, absorb_window, commit)` closures shared by
    `make_eagle_generate` (while_loop around `block`), the continuous-
    batching `engine.eagle_server.EagleSlotEngine` (vmapped `block` per
    pool step), and `make_eagle_pool` (vmapped absorb/commit around ONE
    slot-batched target forward).

    prefill(params_t, params_e, prompt [P], prompt_len, key)
        -> (tokens [S], length, tcache, ekv, feat_buf, key')
    block(params_t, params_e, tokens, length, tcache, ekv, feat_buf, kb)
        -> (tokens, new_length, acc_len, path_len, hit_eos,
            tcache, ekv, feat_buf)
    with S = P + max_new_tokens + total_tokens + 2 (static from shapes) and
    kb the PER-BLOCK key (the generate loop derives it as
    fold_in(key', blocks+1) — key discipline preserved bit-for-bit)."""
    N = ecfg.total_tokens
    depth = ecfg.depth
    if static_tree is not None:
        assert (static_tree.num_nodes, static_tree.depth) == (N, depth), \
            "pass ecfg = choices.eagle_config_for_tree(ecfg, static_tree)"
    Lpath = depth + 2
    T_abs = Lpath  # head absorb window per block
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    max_new = engine.max_new_tokens
    eos = cfg_t.eos_token_id
    if ecfg.version == 1:
        feat_layers = (-1,)               # final hidden state (EAGLE-1/2)
        Dt3 = cfg_t.hidden_size
    else:
        feat_layers = default_feature_layers(cfg_t)
        Dt3 = 3 * cfg_t.hidden_size

    assert mode in ("greedy", "typical", "hsd", "hsd_ref"), mode
    tfwd = target_forward or (
        lambda p, t, c, ab, pos: transformer.forward(
            cfg_t, p, t, c, attn_bias=ab, positions=pos,
            feature_layers=feat_layers))

    def prefill(params_t, params_e: EagleParams, prompt: jax.Array,
                prompt_len: jax.Array, key: jax.Array):
        P = prompt.shape[0]
        S = P + max_new + N + 2
        start = jnp.broadcast_to(P - prompt_len, (1,)).astype(jnp.int32)
        tcache = init_cache(cfg_t, 1, S)._replace(start=start)
        scratch = max(depth * ecfg.top_k, N) + T_abs
        ekv = init_eagle_kv(ecfg, 1, S + scratch)
        ekv = ekv._replace(start=start[0])

        pos0 = jnp.maximum(jnp.arange(P, dtype=jnp.int32)[None, :]
                           - start[:, None], 0)
        logits, tcache, feats = tfwd(
            params_t, prompt[None, :], tcache,
            jnp.zeros((P, P), jnp.float32), pos0)
        feat_buf = jnp.zeros((S, Dt3), ecfg.dtype).at[:P].set(
            feats[0].astype(ecfg.dtype))
        key, k0 = jax.random.split(key)
        p0 = temp(logits[0, -1])
        root = sample(k0, p0).astype(jnp.int32)

        tokens = jnp.zeros((S,), jnp.int32).at[:P].set(prompt).at[P].set(root)
        length = jnp.int32(P + 1)

        # head prefill absorb: pairs (feature_j, token_{j+1})
        from ..models.eagle import head_forward
        from ..ops.linear import apply_linear as _lin
        femb = jnp.take(params_e.embed, tokens[1:P], axis=0)[None]
        if ecfg.version == 1:
            ffeat = feat_buf[:P - 1].astype(ecfg.dtype)[None]
        else:
            ffeat = _lin(params_e.fc, feat_buf[:P - 1].astype(ecfg.dtype))[None]
        ppos = (jnp.arange(P - 1) - ekv.start)[None, :]
        _, ekv = head_forward(ecfg, params_e, femb.astype(ecfg.dtype), ffeat,
                              ekv, ppos)
        return tokens, length, tcache, ekv, feat_buf, key

    def absorb_window(params_e, ekv, feat_buf, tokens, upto):
        """Re-feed the last T_abs (feature, token) pairs so the head KV
        holds pairs 0..upto-1 (the reference's stable_kv catch-up,
        cnets.py:690-696, with fixed window)."""
        S = tokens.shape[0]
        s0 = jnp.maximum(upto - T_abs, 0)
        idx = s0 + jnp.arange(T_abs)
        fwin = jnp.take(feat_buf, jnp.clip(idx, 0, S - 1), axis=0)
        twin = jnp.take(tokens, jnp.clip(idx + 1, 0, S - 1), axis=0)
        ekv = ekv._replace(length=s0)
        root = tokens[jnp.clip(idx[-1] + 1, 0, S - 1)]
        if static_tree is not None:
            from ..models.choices import build_static_trie
            trie, ekv = build_static_trie(
                ecfg, params_e, fwin[None], twin[None], ekv, s0, root,
                static_tree)
        else:
            trie, ekv = build_trie(
                ecfg, params_e, fwin[None], twin[None], ekv, s0, root)
        return trie, ekv

    def commit(trie, probs, tfeats, tokens, length, k1, k2, feat_buf):
        """Steps 3/4/6 of the block for ONE slot: verify the trie against
        `probs` [N+1, V], commit the accepted path + sampled next token into
        `tokens`/`feat_buf`, and return the compaction selector. Shared by
        the single-slot block (below) and the slot-batched pool
        (`make_eagle_pool` vmaps it; tfeats rides per slot)."""
        S = tokens.shape[0]
        # 3) per-path probability rows + verification
        ri = trie.retrieve_indices                        # [N+1, Lpath]
        cand = jnp.where(ri >= 0,
                         jnp.take(trie.draft_tokens,
                                  jnp.clip(ri, 0, N), axis=0), -1)
        # (probs, ri) tuple layout: the verifiers gather per-node rows
        # on demand instead of materializing the [R, Lpath, V] path
        # duplicate (~8x the node probabilities; verify/trie._paths_view)
        p_paths = (probs, ri)
        if mode == "greedy":
            best, acc_len, sample_p = verify_trie_greedy(cand, p_paths)
        elif mode == "typical":
            best, acc_len, sample_p = verify_trie_typical(k1, cand, p_paths)
        elif mode == "hsd_ref":
            # committed-reference frontier (raw window product, EAGLE
            # utils.py:585) — accepts more, measurably biased
            # (docs/LOSSLESSNESS.md)
            best, acc_len, sample_p = verify_trie_hsd(
                k1, cand, p_paths, frontier="raw")
        else:
            best, acc_len, sample_p = verify_trie_hsd(k1, cand, p_paths)

        # 4) commit accepted path + sampled next token
        path = cand[best]                                 # [Lpath]
        ncommit = acc_len + 1                             # path tokens used
        posn = jnp.arange(S)
        src = jnp.take(path, jnp.clip(posn - (length - 1), 0, Lpath - 1))
        write = (posn >= length) & (posn < length - 1 + ncommit)
        tokens = jnp.where(write, src, tokens)
        nxt = sample(k2, sample_p).astype(jnp.int32)
        new_length = length - 1 + ncommit + 1
        tokens = tokens.at[jnp.clip(new_length - 1, 0, S - 1)].set(nxt)

        # compaction selector for step 5 (caller applies it to its cache)
        sel = jnp.where(jnp.arange(Lpath) < ncommit,
                        jnp.clip(trie.retrieve_indices[best], 0, N), -1)

        # 6) scatter accepted features into the ring buffer
        fsel = jnp.take(tfeats, jnp.clip(sel, 0, N), axis=0)
        fbase = length - 1
        fwrite = (posn >= fbase) & (posn < fbase + ncommit)
        fsrc = jnp.take(fsel, jnp.clip(posn - fbase, 0, Lpath - 1), axis=0)
        feat_buf = jnp.where(fwrite[:, None], fsrc.astype(feat_buf.dtype),
                             feat_buf)

        hit_eos = jnp.any(write & (tokens == eos)) | (nxt == eos)
        return (tokens, new_length, acc_len, trie.path_len[best], hit_eos,
                sel, ncommit, feat_buf)

    def block(params_t, params_e: EagleParams, tokens, length, tcache, ekv,
              feat_buf, kb):
        k1, k2 = jax.random.split(kb)

        # 1) trie draft: absorb latest pairs, beam out the tree
        trie, ekv = absorb_window(params_e, ekv, feat_buf, tokens, length - 1)

        # 2) tree-masked target forward over the trie block
        bias = jnp.where(trie.tree_mask, 0.0, -1e30).astype(jnp.float32)
        base = tcache.length
        pos = (trie.position_ids + length - 1 - tcache.start[0])[None, :]
        tlogits, tcache, tfeats = tfwd(
            params_t, trie.draft_tokens[None], tcache, bias, pos)
        probs = temp(tlogits[0])          # [N+1, V]

        # 3/4/6) verify + commit (shared with the slot-batched pool)
        (tokens, new_length, acc_len, plen, hit_eos, sel, ncommit,
         feat_buf) = commit(trie, probs, tfeats[0], tokens, length, k1, k2,
                            feat_buf)

        # 5) target KV compaction to the accepted path
        tcache = compact_path(tcache, sel, ncommit, base)

        return (tokens, new_length, acc_len, plen, hit_eos,
                tcache, ekv, feat_buf)

    return prefill, block, absorb_window, commit


def make_eagle_pool(cfg_t: ModelConfig, ecfg: EagleConfig,
                    engine: EngineConfig, mode: str = "hsd",
                    target_forward=None, static_tree=None):
    """Slot-BATCHED eagenerate block: one step for a whole pool of B slots
    with ONE target tree forward over the stacked tries.

    Why not vmap the single-slot block (the engine's original pool step)?
    The target tree forward dominates the EAGLE block (~13 of 21.5 ms at 8B
    geometry — an ~8 GB quantized weight stream per block), and vmap over a
    `pallas_call` extends the GRID, so the vmapped pool re-streams the
    weights once PER SLOT. Here the tries are stacked into one [B, N+1]
    token batch instead: the matvec kernels flatten leading dims into their
    activation row plane (ops/gptq_pallas.gptq_matmul), so B slots share
    one weight pass. Slots sit at divergent cache frontiers, so the
    forward runs with per-row `lengths` (models/transformer.forward) and
    compaction uses the per-row `kvcache.compact_path_batched`.

    The beam/absorb (small head) and verify/commit (element ops) stay
    vmapped per slot — they re-stream only head-sized weights.

    Tree KV placement is STAGED: the batched forward writes all B tries at
    the cache's fixed tail region [S_tok, S_tok + N+1) — one uniform
    dynamic_update_slice per layer — and compaction copies each slot's
    accepted path from staging into its own frontier
    (`kvcache.compact_path_staged`). The first cut appended at each row's
    frontier via scatter; that measured ~3 ms/LAYER at B=4 (XLA scatter of
    B*(N+1) rows inside the scan) and made the batched pool slower than the
    vmapped one. The pool cache must therefore be N+1 slots LONGER than the
    token buffer (`EagleSlotEngine` sizes it so).

    Returns `pool_block(params_t, params_e, tokens [B,S], lengths [B],
    tcache (batch-B KVCache, max_len = S + N+1), ekv (leading-B pytree),
    feat_buf [B,S,Dt], keys [B]) -> (tokens, lengths', acc_len [B],
    path_len [B], hit_eos [B], tcache, ekv, feat_buf)` — same per-slot math
    as `make_eagle_block`'s block (shared `absorb_window`/`commit`
    closures), so the greedy invariant (greedy EAGLE == target AR greedy,
    per slot) carries over.

    target_forward must accept `lengths=` and `staging_at=` (the default
    transformer.forward does; `eval.synthetic.make_coupled_eagle_target`
    passes them through). The reference has no serving at all
    (single-request eagenerate, ea_model.py:194-366)."""
    N = ecfg.total_tokens
    _, _, absorb_window, commit = make_eagle_block(
        cfg_t, ecfg, engine, mode=mode, target_forward=target_forward,
        static_tree=static_tree)
    temp = processor(engine.temperature, engine.top_k, engine.top_p)
    if ecfg.version == 1:
        feat_layers = (-1,)
    else:
        feat_layers = default_feature_layers(cfg_t)
    tfwd = target_forward or (
        lambda p, t, c, ab, pos, lengths=None, staging_at=None:
        transformer.forward(
            cfg_t, p, t, c, attn_bias=ab, positions=pos,
            feature_layers=feat_layers, lengths=lengths,
            staging_at=staging_at))

    def pool_block(params_t, params_e: EagleParams, tokens, lengths,
                   tcache, ekv, feat_buf, keys):
        staging_at = tcache.max_len - (N + 1)
        if staging_at != tokens.shape[1]:
            # not a bare assert: under python -O a mis-sized pool cache
            # would silently alias the staging tail over live KV entries
            raise ValueError(
                f"pool cache (max_len={tcache.max_len}) must extend the "
                f"token buffer (S={tokens.shape[1]}) by the staging region "
                f"(N+1={N + 1})")
        ks = jax.vmap(jax.random.split)(keys)            # [B, 2, 2]
        k1s, k2s = ks[:, 0], ks[:, 1]

        # 1) per-slot beam tries (head-sized weights; vmap acceptable)
        trie, ekv = jax.vmap(absorb_window, in_axes=(None, 0, 0, 0, 0))(
            params_e, ekv, feat_buf, tokens, lengths - 1)

        # 2) ONE slot-batched tree-masked target forward, staged
        bias = jnp.where(trie.tree_mask, 0.0, -1e30).astype(jnp.float32)
        base = lengths - 1          # per-slot target-cache frontier: the
        #                             cache holds length-1 committed keys
        #                             (prefill leaves P keys for P+1 tokens)
        pos = trie.position_ids + (base - tcache.start)[:, None]
        tlogits, tcache, tfeats = tfwd(params_t, trie.draft_tokens, tcache,
                                       bias, pos, lengths=base,
                                       staging_at=staging_at)
        probs = temp(tlogits)                            # [B, N+1, V]

        # 3/4/6) per-slot verify + commit (shared closure)
        (tokens, new_lengths, acc_len, plen, hit_eos, sel, ncommit,
         feat_buf) = jax.vmap(commit)(trie, probs, tfeats, tokens, lengths,
                                      k1s, k2s, feat_buf)

        # 5) staged tree-path KV compaction (staging -> per-row frontier)
        tcache = compact_path_staged(tcache, sel, ncommit, base,
                                     src_base=staging_at)
        return (tokens, new_lengths, acc_len, plen, hit_eos, tcache, ekv,
                feat_buf)

    return pool_block


def make_eagle_generate(cfg_t: ModelConfig, ecfg: EagleConfig,
                        engine: EngineConfig, mode: str = "hsd",
                        target_forward=None, static_tree=None):
    """Build jitted `generate(params_target, eagle_params, prompt, prompt_len,
    key)` for mode in {'greedy', 'typical', 'hsd'}.

    target_forward: optional `(params, tokens, cache, attn_bias, positions)
    -> (logits, cache, feats)` override — e.g.
    `parallel.tp.make_tp_eagle_forward(cfg_t, params_t, feature_layers)` to
    run the base model on local Megatron shards (Pallas kernels) while the
    draft head stays replicated.
    static_tree: optional `models.choices.StaticTree` — draft a FIXED choice
    tree (the reference's legacy EAGLE-1 path, choices.py + generate_tree_
    buffers, utils.py:90-208) instead of the dynamic beam trie; shape params
    of `ecfg` must match (`choices.eagle_config_for_tree`)."""
    N = ecfg.total_tokens
    max_new = engine.max_new_tokens
    eos = cfg_t.eos_token_id
    prefill_fn, block_fn, _, _ = make_eagle_block(
        cfg_t, ecfg, engine, mode=mode, target_forward=target_forward,
        static_tree=static_tree)

    def generate(params_t, params_e: EagleParams, prompt: jax.Array,
                 prompt_len: jax.Array, key: jax.Array) -> EagleGenerateResult:
        P = prompt.shape[0]
        S = P + max_new + N + 2
        tokens, length, tcache, ekv, feat_buf, key = prefill_fn(
            params_t, params_e, prompt, prompt_len, key)

        accepts = jnp.full((max_new,), -1, jnp.int32)
        dlens = jnp.full((max_new,), -1, jnp.int32)
        plens = jnp.full((max_new,), -1, jnp.int32)

        def cond(state):
            (_, length, done, _, _, _, _, _, _, blocks) = state
            return (~done) & (length + N + 2 <= S) & (blocks < max_new) & \
                (length - P < max_new)

        def body(state):
            (tokens, length, done, tcache, ekv, feat_buf, accepts, dlens,
             plens, blocks) = state
            kb = jax.random.fold_in(key, blocks + 1)
            (tokens, new_length, acc_len, plen, hit_eos, tcache, ekv,
             feat_buf) = block_fn(params_t, params_e, tokens, length, tcache,
                                  ekv, feat_buf, kb)
            done = done | hit_eos
            accepts = accepts.at[blocks].set(acc_len)
            dlens = dlens.at[blocks].set(N)
            plens = plens.at[blocks].set(plen)
            return (tokens, new_length, done, tcache, ekv, feat_buf, accepts,
                    dlens, plens, blocks + 1)

        state = (tokens, length, jnp.bool_(False), tcache, ekv, feat_buf,
                 accepts, dlens, plens, jnp.int32(0))
        (tokens, length, done, _, _, _, accepts, dlens, plens, blocks) = \
            jax.lax.while_loop(cond, body, state)

        length = jnp.minimum(length, P + max_new)
        gen_pos = jnp.arange(S)
        is_eos = (tokens == eos) & (gen_pos >= P) & (gen_pos < length)
        first_eos = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), length)
        length = jnp.minimum(length, first_eos + 1)
        return EagleGenerateResult(tokens=tokens, length=length,
                                   prompt_len=jnp.int32(P), blocks=blocks,
                                   accepts=accepts, draft_lens=dlens,
                                   ncommit=length - P, path_lens=plens)

    return jax.jit(generate)
