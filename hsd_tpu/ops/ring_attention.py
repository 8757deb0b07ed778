"""Ring attention: exact causal attention over a sequence-sharded axis.

The long-context prefill lever: a 32k-token prompt's attention activations
do not fit one chip, so the TOKEN axis shards over an `sp` mesh axis and
K/V blocks travel the ring (`ppermute`) while each device holds its query
chunk. Online (flash-style) softmax accumulators in float32 keep the result
EXACT — renormalizing with the running row max as each block arrives — so
sp-sharded prefill equals the single-device forward bit-for-near (f32
accumulation; validated in tests/test_sp.py).

Causality is enforced by GLOBAL positions, not block order: each incoming
block carries its chunk index, and the per-pair mask is q_pos >= k_pos, so
ragged/padded chunks work unchanged. GQA runs as the grouped einsum over
[kv_head, rep] (never materializing repeated K/V — same rule as
transformer._attention).

Cost: sp ppermute hops of the K/V block per layer; each hop overlaps with
the block's attention math under XLA's async collectives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   q_pos: jax.Array, axis: str) -> jax.Array:
    """q: [B, Tc, H, d] local query chunk; k/v: [B, Tc, Hkv, d] local K/V
    chunk; q_pos: [B, Tc] GLOBAL positions of the local queries (k positions
    are derived the same way on each source device and travel with the
    block). Returns [B, Tc, H, d].

    Call inside a shard_map over `axis`; every device must call with its own
    chunk (SPMD)."""
    B, Tc, H, d = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv
    sp = jax.lax.axis_size(axis)
    qg = (q.astype(jnp.float32) * (d ** -0.5)).reshape(B, Tc, Hkv, rep, d)

    # flash accumulators
    acc = jnp.zeros((B, Tc, Hkv, rep, d), jnp.float32)
    m = jnp.full((B, Tc, Hkv, rep), -jnp.inf, jnp.float32)
    den = jnp.zeros((B, Tc, Hkv, rep), jnp.float32)

    ring = [(i, (i + 1) % sp) for i in range(sp)]
    # K/V blocks travel WITH their positions so causality is global
    kv_pos = q_pos  # same chunking for q and kv on each device
    blk = (k.astype(jnp.float32), v.astype(jnp.float32), kv_pos)

    for step in range(sp):
        kb, vb, pb = blk
        scores = jnp.einsum("btkrd,bskd->btkrs", qg, kb)     # [B,Tc,Hkv,rep,Tc']
        mask = q_pos[:, :, None] >= pb[:, None, :]           # [B, Tc, Tc']
        scores = jnp.where(mask[:, :, None, None, :], scores, -1e30)
        blk_max = jnp.max(scores, axis=-1)                   # [B,Tc,Hkv,rep]
        new_m = jnp.maximum(m, blk_max)
        # rescale old accumulators to the new max
        scale_old = jnp.exp(m - new_m)
        p = jnp.exp(scores - new_m[..., None])
        # fully-masked rows: new_m stays -inf -> p = exp(-inf+inf); guard
        p = jnp.where(jnp.isfinite(new_m)[..., None], p, 0.0)
        scale_old = jnp.where(jnp.isfinite(m), scale_old, 0.0)
        acc = acc * scale_old[..., None] + jnp.einsum(
            "btkrs,bskd->btkrd", p, vb)
        den = den * scale_old + jnp.sum(p, axis=-1)
        m = new_m
        if step < sp - 1:
            blk = jax.lax.ppermute(blk, axis, ring)

    out = acc / jnp.maximum(den[..., None], 1e-30)
    return out.reshape(B, Tc, H, d)
