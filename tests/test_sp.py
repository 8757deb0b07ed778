"""Sequence-parallel ring-attention prefill (parallel/sp.py) on the CPU mesh.

Pins: sp-sharded prefill logits == single-device forward (sp in {2, 4}),
the gathered cache continues decoding identically, and the GQA grouped-ring
math matches dense attention exactly on a standalone case.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import ModelConfig
from hsd_tpu.engine import init_cache
from hsd_tpu.models import init_params, transformer
from hsd_tpu.parallel.sp import (gather_cache, make_sp_mesh, make_sp_prefill)

CFG = ModelConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_layers=3, num_heads=4, num_kv_heads=2)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_prefill_matches_single(sp):
    pt = init_params(CFG, jax.random.PRNGKey(0))
    T = 16
    toks = ((jnp.arange(T, dtype=jnp.int32) * 7) % 50)[None, :] + 1
    ref_logits, ref_cache = transformer.forward(CFG, pt, toks,
                                                init_cache(CFG, 1, T))
    mesh = make_sp_mesh(sp)
    with jax.set_mesh(mesh):
        prefill = jax.jit(make_sp_prefill(CFG, sp))
        logits, cache = prefill(pt, toks)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=3e-2, atol=3e-2)
    assert int(cache.length) == T
    np.testing.assert_allclose(np.asarray(cache.k), np.asarray(ref_cache.k),
                               rtol=3e-2, atol=3e-2)


def test_sp_cache_continues_decode():
    """Decode from the gathered sp cache == decode from a single-device
    prefill cache (token-for-token at argmax)."""
    pt = init_params(CFG, jax.random.PRNGKey(0))
    T, S = 16, 24
    toks = ((jnp.arange(T, dtype=jnp.int32) * 5) % 50)[None, :] + 1
    _, ref_cache = transformer.forward(CFG, pt, toks, init_cache(CFG, 1, S))
    mesh = make_sp_mesh(2)
    with jax.set_mesh(mesh):
        prefill = jax.jit(make_sp_prefill(CFG, 2))
        _, spc = prefill(pt, toks)
    cache = gather_cache(spc, S)
    nxt = jnp.asarray([[7]], jnp.int32)
    l_ref, _ = transformer.forward(CFG, pt, nxt, ref_cache)
    l_sp, _ = transformer.forward(CFG, pt, nxt, cache)
    np.testing.assert_allclose(np.asarray(l_sp), np.asarray(l_ref),
                               rtol=3e-2, atol=3e-2)
    assert int(jnp.argmax(l_sp[0, -1])) == int(jnp.argmax(l_ref[0, -1]))


def test_ring_attention_exact_vs_dense():
    """Standalone ring attention == dense causal softmax attention (f32)."""
    from hsd_tpu.ops.ring_attention import ring_attention
    B, T, H, Hkv, d, sp = 1, 12, 4, 2, 8, 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, d)), jnp.float32)

    # dense reference
    rep = H // Hkv
    qg = q.reshape(B, T, Hkv, rep, d) * (d ** -0.5)
    scores = jnp.einsum("btkrd,bskd->btkrs", qg, k)
    mask = jnp.arange(T)[:, None] >= jnp.arange(T)[None, :]
    scores = jnp.where(mask[None, :, None, None, :], scores, -1e30)
    w = jax.nn.softmax(scores, -1)
    ref = jnp.einsum("btkrs,bskd->btkrd", w, v).reshape(B, T, H, d)

    mesh = make_sp_mesh(sp)
    Tc = T // sp
    from jax.sharding import PartitionSpec as P
    with jax.set_mesh(mesh):
        def local(q, k, v):
            i = jax.lax.axis_index("sp")
            pos = jnp.broadcast_to((i * Tc + jnp.arange(Tc))[None], (B, Tc))
            return ring_attention(q, k, v, pos, "sp")
        out = jax.jit(jax.shard_map(
            local, in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"), check_vma=False))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
