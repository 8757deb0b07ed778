"""Sequence parallelism: ring-attention prefill over an `sp` mesh axis.

Long prompts are the one place the decode engines' single-chip forward
can't stretch: prefill attention activations grow with T^2/chunk and the KV
write with T. Here the TOKEN axis of the prompt shards over `sp` devices;
every position-wise op (embeddings, norms, MLPs, logits) runs on the local
chunk unchanged, and attention runs as EXACT ring attention — K/V blocks
travel the ring while flash-style f32 accumulators renormalize online
(ops/ring_attention.py).

The resulting KV cache is SEQUENCE-SHARDED (cache slots [i*Tc, (i+1)*Tc)
live on device i). `gather_cache` re-gathers it into the replicated layout
the decode engines use — prefill memory was the bottleneck, decode reads
the cache sequentially — or keep it sharded for sp-local losses/scoring.

Validated against the single-device forward on the CPU mesh
(tests/test_sp.py).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..engine.kvcache import KVCache, init_cache
from ..models import transformer
from ..models.transformer import ModelParams

SP_AXIS = "sp"


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:sp]
    return Mesh(np.asarray(devices).reshape(sp), (SP_AXIS,))


def make_sp_prefill(cfg: ModelConfig, sp: int):
    """Build `prefill(params, tokens [B, T]) -> (logits [B, T, V], cache)`
    with T sharded over `sp` (T % sp == 0). The returned cache holds T slots
    whose SEQUENCE axis is sp-sharded; `cache.length == T` on every shard.
    Run under a mesh containing SP_AXIS of size sp; params replicated."""

    def local(p, tokens):
        B, Tc = tokens.shape
        i = jax.lax.axis_index(SP_AXIS)
        pos = (i * Tc + jnp.arange(Tc))[None, :].astype(jnp.int32)
        pos = jnp.broadcast_to(pos, (B, Tc))
        cache = init_cache(cfg, B, Tc)
        logits, cache = transformer.forward(cfg, p, tokens, cache,
                                            positions=pos,
                                            ring_axis=SP_AXIS)
        # global length (= T) on every shard so downstream length math holds
        T = Tc * jax.lax.axis_size(SP_AXIS)
        cache = cache._replace(length=jnp.int32(T))
        return logits, cache

    cspec = KVCache(k=P(None, None, SP_AXIS), v=P(None, None, SP_AXIS),
                    length=P(), start=P(None))
    return jax.shard_map(local, in_specs=(P(), P(None, SP_AXIS)),
                         out_specs=(P(None, SP_AXIS), cspec),
                         check_vma=False)


def gather_cache(cache: KVCache, total_slots: int) -> KVCache:
    """Re-gather an sp-sharded prefill cache into the replicated engine
    layout with `total_slots` capacity (>= prefill T): one device_put after
    prefill; the prefill peak memory was the point of sharding."""
    k = jnp.asarray(cache.k)
    v = jnp.asarray(cache.v)
    L, B, T = k.shape[:3]
    pad = total_slots - T
    assert pad >= 0, (total_slots, T)
    widen = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    return KVCache(k=widen(k), v=widen(v), length=cache.length,
                   start=cache.start)
