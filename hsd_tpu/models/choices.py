"""Static choice-tree drafting (EAGLE-1 legacy path).

The reference's legacy EAGLE mode drafts a FIXED tree topology instead of a
dynamic beam trie: a `choices` list of rank-paths (e.g. `[0, 1]` = "the
rank-1 child of the rank-0 child of the root"), preprocessed by
`generate_tree_buffers` into attention-mask / position / retrieve buffers
(ref: EAGLE-3H/eagle/model/choices.py:1, eagle/model/utils.py:90-208, plus
the `utils_c.py` variant). `mc_sim_7b_63` below is the published 63-node
Medusa sparse-tree constant the reference ships.

TPU-first design: the topology is STATIC configuration, so every buffer the
dynamic `build_trie` computes in-graph (ancestor closure, position ids,
retrieve paths) is precomputed HOST-side in numpy once and baked into the
compiled program as constants; runtime work is only the `depth` head
forwards that fill in the token ids (one forward per level, all nodes of the
level batched). The result is the same `Trie` structure the engine and the
trie verifiers already consume — static and dynamic trees share every
downstream component.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import apply_linear
from .eagle import (EagleConfig, EagleKV, EagleParams, Trie, draft_logp,
                    head_forward)

# The published Medusa/EAGLE-1 sparse choice tree for 7B models (63 nodes in
# the original; this 25-node prefix is what the reference ships as
# mc_sim_7b_63, choices.py:1).
mc_sim_7b_63: List[List[int]] = [
    [0], [1], [2], [3],
    [0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [2, 0], [2, 1], [3, 0],
    [0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 1, 0], [0, 1, 1], [0, 2, 0],
    [0, 2, 1], [1, 0, 0],
    [0, 0, 0, 0], [0, 0, 0, 1], [0, 0, 0, 2],
    [0, 0, 0, 0, 0], [0, 0, 0, 0, 1],
]


@dataclasses.dataclass(frozen=True)
class StaticTree:
    """Host-precomputed buffers for a static choice tree (the TPU counterpart
    of the reference's `generate_tree_buffers` dict, utils.py:90-208)."""

    choices: Tuple[Tuple[int, ...], ...]   # sorted by (len, lex)
    num_nodes: int                         # N (excluding root)
    depth: int                             # max path length
    top_k: int                             # max child rank + 1
    parents: np.ndarray                    # [N+1] int32; root = -1
    tree_mask: np.ndarray                  # [N+1, N+1] bool ancestor closure
    position_ids: np.ndarray               # [N+1] int32 node depth
    retrieve_indices: np.ndarray           # [N+1, depth+2] int32, -1 pad
    path_len: np.ndarray                   # [N+1] int32
    num_paths: int                         # leaf count
    level_nodes: Tuple[Tuple[int, ...], ...]   # 1-based node ids per level
    level_parent_pos: Tuple[Tuple[int, ...], ...]  # index of parent within
    #                                                its own level's node list
    level_rank: Tuple[Tuple[int, ...], ...]    # child rank under the parent


def build_tree_buffers(choices: Sequence[Sequence[int]]) -> StaticTree:
    """Precompute the static-tree buffers (host, numpy).

    Semantics match the reference's generate_tree_buffers (utils.py:90-208):
    nodes sorted by (depth, lexicographic), ancestor-closure attention mask
    with every node attending the root, depth position ids, and root-first
    leaf retrieve paths sorted lexicographically — expressed in the engine's
    Trie conventions (node index space with root = 0, -1 tail padding)."""
    sc = sorted((tuple(c) for c in choices), key=lambda c: (len(c), c))
    assert len(set(sc)) == len(sc), "duplicate choices"
    N = len(sc)
    depth = max(len(c) for c in sc)
    top_k = max(c[-1] for c in sc) + 1
    index = {c: i + 1 for i, c in enumerate(sc)}       # node ids, root = 0

    parents = np.full((N + 1,), -1, np.int32)
    for c, i in index.items():
        assert len(c) == 1 or c[:-1] in index, f"orphan choice {c}"
        parents[i] = 0 if len(c) == 1 else index[c[:-1]]

    tree_mask = np.zeros((N + 1, N + 1), bool)
    tree_mask[0, 0] = True
    position_ids = np.zeros((N + 1,), np.int32)
    for c, i in index.items():
        tree_mask[i] = tree_mask[parents[i]]
        tree_mask[i, i] = True
        position_ids[i] = len(c)

    is_parent = np.zeros((N + 1,), bool)
    is_parent[parents[1:]] = True
    leaves = [i for i in range(1, N + 1) if not is_parent[i]]

    Lp = depth + 2
    retrieve = np.full((N + 1, Lp), -1, np.int32)
    plen = np.zeros((N + 1,), np.int32)
    rows = []
    for i in leaves:
        path, cur = [], i
        while cur > 0:
            path.append(cur)
            cur = parents[cur]
        path.append(0)
        rows.append(path[::-1])
    BIG = N + 5
    rows.sort(key=lambda r: [x if x >= 0 else BIG for x in
                             r + [BIG] * (Lp - len(r))])
    for j, r in enumerate(rows):
        retrieve[j, :len(r)] = r
        plen[j] = len(r)

    level_nodes, level_parent_pos, level_rank = [], [], []
    for lvl in range(depth):
        nodes = [index[c] for c in sc if len(c) == lvl + 1]
        if lvl == 0:
            ppos = [0] * len(nodes)
        else:
            prev = {n: j for j, n in enumerate(level_nodes[lvl - 1])}
            ppos = [prev[parents[n]] for n in nodes]
        rank = [sc[n - 1][-1] for n in nodes]
        level_nodes.append(tuple(nodes))
        level_parent_pos.append(tuple(ppos))
        level_rank.append(tuple(rank))

    return StaticTree(choices=tuple(sc), num_nodes=N, depth=depth,
                      top_k=top_k, parents=parents, tree_mask=tree_mask,
                      position_ids=position_ids, retrieve_indices=retrieve,
                      path_len=plen, num_paths=len(leaves),
                      level_nodes=tuple(level_nodes),
                      level_parent_pos=tuple(level_parent_pos),
                      level_rank=tuple(level_rank))


def eagle_config_for_tree(base: EagleConfig, tree: StaticTree) -> EagleConfig:
    """Derive the EagleConfig shape parameters from a static tree."""
    return dataclasses.replace(base, depth=tree.depth,
                               total_tokens=tree.num_nodes,
                               top_k=max(base.top_k, tree.top_k))


def build_static_trie(cfg: EagleConfig, p: EagleParams,
                      target_features: jax.Array, tokens: jax.Array,
                      kv: EagleKV, prefix_len: jax.Array,
                      root_token: jax.Array, tree: StaticTree
                      ) -> Tuple[Trie, EagleKV]:
    """Fill a static choice tree with head-drafted tokens.

    Same contract as models.eagle.build_trie, but the topology (and every
    derived buffer) is the host-precomputed `tree`; runtime work is one head
    forward per level over that level's nodes. The node fed at trie-KV slot
    1 + (node_id - 1) is masked by the precomputed ancestor closure, so the
    drafted tokens are exactly the reference's static-tree candidates
    (tree_indices selection, utils.py:130-158)."""
    N, depth = tree.num_nodes, tree.depth
    assert cfg.total_tokens == N and cfg.depth == depth, (
        "use eagle_config_for_tree to match engine shapes to the tree")
    # 1) absorb the accepted (feature, token) pairs — identical to build_trie
    if cfg.version == 1:
        feat = target_features.astype(cfg.dtype)
    else:
        feat = apply_linear(p.fc, target_features.astype(cfg.dtype))
    emb = jnp.take(p.embed, tokens, axis=0).astype(cfg.dtype)
    T = tokens.shape[1]
    pos = prefix_len + jnp.arange(T)[None, :] - kv.start
    out_hidden, kv = head_forward(cfg, p, emb, feat, kv, pos)
    last_hidden = out_hidden[:, -1]                       # [1, D]
    kv_stable = kv
    base_len = kv.length

    # trie-KV slot of node i (1-based) = base_len + i - 1 when fed; the root
    # pair is the last absorbed pair (slot base_len - 1), already causal.
    node_tokens = jnp.zeros((N + 1,), jnp.int32).at[0].set(root_token)
    node_hidden = jnp.zeros((N + 1, last_hidden.shape[-1]), cfg.dtype)
    node_hidden = node_hidden.at[0].set(last_hidden[0])

    # level-0 candidates come from the absorbed root state
    logp = draft_logp(cfg, p, last_hidden)[0]             # [Vd]
    _, top_i = jax.lax.top_k(logp, tree.top_k)
    top_t = (top_i + p.d2t[top_i]).astype(jnp.int32)
    n0 = np.asarray(tree.level_nodes[0])
    node_tokens = node_tokens.at[n0].set(top_t[np.asarray(tree.level_rank[0])])
    node_hidden = node_hidden.at[n0].set(
        jnp.broadcast_to(last_hidden[0], (len(n0), last_hidden.shape[-1])))

    S = kv.k.shape[1]
    slot = jnp.arange(S)[None, :]
    kvk = kv
    # the deepest level has no children, so its nodes are never expanded
    for lvl in range(depth - 1):
        nodes = np.asarray(tree.level_nodes[lvl])         # fed this level
        W = len(nodes)
        # attention over: prefix (causal, past base_len) + static ancestor
        # closure among trie slots (node i+1 occupies slot base_len + i,
        # closure includes self)
        anc = jnp.asarray(tree.tree_mask[nodes][:, 1:])   # [W, N]
        prefix_mask = (slot < base_len) & (slot >= kv.start)
        trie_idx = slot - base_len
        in_trie = (trie_idx >= 0) & (trie_idx < N)
        idx = jnp.clip(jnp.broadcast_to(trie_idx, (W, S)), 0, N - 1)
        anc_mask = jnp.take_along_axis(anc, idx, axis=1) & in_trie
        mask = (jnp.broadcast_to(prefix_mask, (W, S)) | anc_mask)[None]

        emb_t = jnp.take(p.embed, node_tokens[nodes], axis=0)[None]
        posb = jnp.broadcast_to(
            prefix_len + T + lvl - kvk.start, (1, W)).astype(jnp.int32)
        # nodes of level lvl write their KV at their own static slots
        kv_in = EagleKV(kvk.k, kvk.v, base_len + int(nodes[0]) - 1, kvk.start)
        out, kv_out = head_forward(cfg, p, emb_t.astype(cfg.dtype),
                                   node_hidden[nodes][None], kv_in, posb, mask)
        kvk = kv_out
        out = out[0]                                      # [W, D]
        logp = draft_logp(cfg, p, out)                    # [W, Vd]
        _, ctop = jax.lax.top_k(logp, tree.top_k)
        ctop = (ctop + p.d2t[ctop]).astype(jnp.int32)
        child = np.asarray(tree.level_nodes[lvl + 1])
        ppos = np.asarray(tree.level_parent_pos[lvl + 1])
        rank = np.asarray(tree.level_rank[lvl + 1])
        node_tokens = node_tokens.at[child].set(ctop[ppos, rank])
        node_hidden = node_hidden.at[child].set(out[ppos])

    trie = Trie(draft_tokens=node_tokens,
                parents=jnp.asarray(tree.parents),
                tree_mask=jnp.asarray(tree.tree_mask),
                position_ids=jnp.asarray(tree.position_ids),
                retrieve_indices=jnp.asarray(tree.retrieve_indices),
                num_paths=jnp.int32(tree.num_paths),
                path_len=jnp.asarray(tree.path_len))
    return trie, kv_stable
