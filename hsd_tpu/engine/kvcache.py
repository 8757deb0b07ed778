"""Static preallocated KV cache with O(1) speculative rollback.

Design (SURVEY.md §7 "Static shapes everywhere"): the reference's HF
DynamicCache reallocates tensors every step and implements rollback by
slicing + batch-row selection (`transformers/cache_utils.py:447-553`,
`candidate_generator.py:713-770`); EAGLE's static KVCache
(`EAGLE-3H/eagle/model/kv_cache.py`) preallocates and compacts in place —
the right model for TPU. Here:

  * buffers are fixed [L, B, S_max, H_kv, D] arrays; `length` is a device
    scalar — the number of valid positions;
  * append  = dynamic_update_slice at `length` (in place under jit with
    donated buffers);
  * rollback = set `length` lower; stale tail entries are dead because
    attention masks by `length` and future appends overwrite them;
  * multidraft row-select (the reference's `crop(..., selected_draft)`)
    = gather one batch row and broadcast, also in place.

Sharding: buffers carry a NamedSharding with H_kv on the model axis, so both
append and rollback are purely local (no resharding) on every chip.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig


class KVCache(NamedTuple):
    k: jax.Array        # [L, B, S_max, H_kv, D]
    v: jax.Array        # [L, B, S_max, H_kv, D]
    length: jax.Array   # int32 scalar — valid positions (uniform over batch)
    start: jax.Array    # int32 [B] — left-padding offset per row: cache slots
    #                      [0, start) are dead (prompts are LEFT-padded into
    #                      fixed-size buckets so every shape stays static);
    #                      RoPE position of slot s is s - start.

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(cfg: ModelConfig, batch: int, max_len: int,
               dtype=None) -> KVCache:
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.int32(0), start=jnp.zeros((batch,), jnp.int32))


def append_layer(cache_k_l: jax.Array, cache_v_l: jax.Array, length: jax.Array,
                 k_new: jax.Array, v_new: jax.Array):
    """Write k_new/v_new [B, T, H_kv, D] at positions [length, length+T).

    Called per layer inside the scan-over-layers; T is static.
    """
    start = (0, length, 0, 0)
    k = jax.lax.dynamic_update_slice(cache_k_l, k_new.astype(cache_k_l.dtype), start)
    v = jax.lax.dynamic_update_slice(cache_v_l, v_new.astype(cache_v_l.dtype), start)
    return k, v


def append_layer_stacked(k_all: jax.Array, v_all: jax.Array, idx: jax.Array,
                         length: jax.Array, k_new: jax.Array,
                         v_new: jax.Array):
    """Write k_new/v_new [B, T, H_kv, D] into layer `idx` of the FULL stacked
    cache [L, B, S, H_kv, D] at positions [length, length+T).

    Used when the cache rides the layer scan's CARRY instead of xs/ys: the
    in-place dynamic-update aliases the carry buffer and the per-layer read
    slice fuses into the attention einsum, so cache HBM traffic per decode
    step is ONE read pass (measured 693 vs 452 GB/s effective for the xs/ys
    form at S=4k — xs slicing + ys re-stacking costs an extra half pass).
    """
    start = (idx, 0, length, 0, 0)
    k_all = jax.lax.dynamic_update_slice(
        k_all, k_new.astype(k_all.dtype)[None], start)
    v_all = jax.lax.dynamic_update_slice(
        v_all, v_new.astype(v_all.dtype)[None], start)
    return k_all, v_all


def append_layer_stacked_ragged(k_all: jax.Array, v_all: jax.Array,
                                idx: jax.Array, lengths: jax.Array,
                                k_new: jax.Array, v_new: jax.Array):
    """Per-ROW append into layer `idx` of the stacked cache: row b writes
    k_new[b]/v_new[b] [T, H_kv, D] at positions [lengths[b], lengths[b]+T).

    The slot-batched serving path (engine/eagle_server batched pool): slots
    committed different numbers of tokens, so their cache frontiers diverge
    — a scalar-`length` dynamic_update_slice cannot place all rows. One
    scatter per layer (B*T rows of [H, D]) replaces it; tiny next to the
    weight stream the batching exists to amortize."""
    B, T = k_new.shape[:2]
    b_ids = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    pos = lengths[:, None] + jnp.arange(T)[None, :]
    k_all = k_all.at[idx, b_ids, pos].set(k_new.astype(k_all.dtype))
    v_all = v_all.at[idx, b_ids, pos].set(v_new.astype(v_all.dtype))
    return k_all, v_all


def rollback(cache: KVCache, new_length: jax.Array) -> KVCache:
    """Speculative rollback: truncate to `new_length` valid positions.

    O(1): no data movement (ref equivalent: `_crop_past_key_values`,
    candidate_generator.py:713-770)."""
    return cache._replace(length=new_length.astype(jnp.int32))


def compact_path(cache: KVCache, rel_indices: jax.Array, n_valid: jax.Array,
                 base: jax.Array) -> KVCache:
    """Tree-path KV compaction (ref: EAGLE KVCache.copy, kv_cache.py:38-50,
    update_inference_inputs, eagle/model/utils.py:653-663).

    The tree forward wrote entries for all trie nodes at [base, base+N+1);
    keep only the accepted path: gather seq slots base + rel_indices[j]
    (fixed-size, -1 padded) into contiguous [base, base + n_valid) and set
    length = base + n_valid. Slots past n_valid receive junk from clipped
    gathers — dead by the length contract. Gathers are per-sequence-slot and
    head-local, so the op stays collective-free on a head-sharded cache."""
    T = rel_indices.shape[0]
    src = base + jnp.clip(rel_indices, 0, cache.max_len - 1)
    kg = jnp.take(cache.k, src, axis=2)     # [L, B, T, H, D]
    vg = jnp.take(cache.v, src, axis=2)
    k = jax.lax.dynamic_update_slice(cache.k, kg, (0, 0, base, 0, 0))
    v = jax.lax.dynamic_update_slice(cache.v, vg, (0, 0, base, 0, 0))
    return cache._replace(k=k, v=v,
                          length=(base + n_valid).astype(jnp.int32))


def compact_path_batched(cache: KVCache, rel_indices: jax.Array,
                         n_valid: jax.Array, base: jax.Array) -> KVCache:
    """Per-ROW tree-path compaction: row b keeps seq slots
    base[b] + rel_indices[b] (fixed-size, -1 padded) into contiguous
    [base[b], base[b] + n_valid[b]).

    The batched twin of `compact_path` for the slot-batched EAGLE pool
    (per-slot bases/accept counts diverge). Junk lands in slots past
    n_valid[b] — dead by each slot's length contract."""
    B, T = rel_indices.shape
    S = cache.max_len
    src = jnp.clip(base[:, None] + jnp.clip(rel_indices, 0, S - 1),
                   0, S - 1)                               # [B, T]
    kg = jnp.take_along_axis(cache.k, src[None, :, :, None, None], axis=2)
    vg = jnp.take_along_axis(cache.v, src[None, :, :, None, None], axis=2)
    b_ids = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    dst = jnp.clip(base[:, None] + jnp.arange(T)[None, :], 0, S - 1)
    k = cache.k.at[:, b_ids, dst].set(kg)
    v = cache.v.at[:, b_ids, dst].set(vg)
    return cache._replace(k=k, v=v)


def compact_path_staged(cache: KVCache, rel_indices: jax.Array,
                        n_valid: jax.Array, dst_base: jax.Array,
                        src_base: int) -> KVCache:
    """Staged tree-path compaction: row b copies staging entries
    src_base + rel_indices[b] (the fixed staging region the batched tree
    forward wrote — transformer.forward staging_at) into its own frontier
    [dst_base[b], dst_base[b] + n_valid[b]).

    Unlike compact_path_batched this scatters only B*T (= slots x path)
    rows — the big per-row traffic stays in the uniform staging append.
    A dst that would land in the staging region (an over-budget row — only
    dead done/frozen rows today) is pushed out of bounds instead, which
    JAX scatter semantics DROP: no duplicate-index collapse onto
    src_base-1 with an unspecified winner."""
    B, T = rel_indices.shape
    src = src_base + jnp.clip(rel_indices, 0, cache.max_len - 1 - src_base)
    kg = jnp.take_along_axis(cache.k, src[None, :, :, None, None], axis=2)
    vg = jnp.take_along_axis(cache.v, src[None, :, :, None, None], axis=2)
    b_ids = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    dst = dst_base[:, None] + jnp.arange(T)[None, :]
    dst = jnp.where((dst >= 0) & (dst < src_base), dst, cache.max_len)
    k = cache.k.at[:, b_ids, dst].set(kg)
    v = cache.v.at[:, b_ids, dst].set(vg)
    return cache._replace(k=k, v=v)


def select_draft_row(cache: KVCache, row: jax.Array) -> KVCache:
    """Multidraft KV rollback: keep draft `row`'s KV in every batch slot
    (ref equivalent: DynamicCache.crop(selected_draft), cache_utils.py:522-553).

    Broadcasting the selected row keeps the batch shape static so the next
    block's K-draft expansion needs no reallocation."""
    k = jnp.broadcast_to(jax.lax.dynamic_slice_in_dim(cache.k, row, 1, axis=1),
                         cache.k.shape)
    v = jnp.broadcast_to(jax.lax.dynamic_slice_in_dim(cache.v, row, 1, axis=1),
                         cache.v.shape)
    start = jnp.broadcast_to(jax.lax.dynamic_slice_in_dim(cache.start, row, 1, 0),
                             cache.start.shape)
    return cache._replace(k=k, v=v, start=start)
