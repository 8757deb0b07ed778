"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4): the
fake-backend coverage the reference never had. Verifies that the TP-sharded
target produces the same results as the single-device run, and that sharded
KV rollback stays local."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import init_cache, make_generate
from hsd_tpu.models import init_params, transformer
from hsd_tpu.parallel import (cache_specs, make_mesh, param_specs, replicate,
                              shard_params)
from jax.sharding import NamedSharding, PartitionSpec as P

CFG = ModelConfig.tiny(vocab_size=256, num_heads=8, num_kv_heads=4,
                       hidden_size=64, intermediate_size=128)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(data=2, model=4)


def test_sharded_forward_matches_single(mesh):
    params = init_params(CFG, jax.random.PRNGKey(0))
    toks = (jnp.arange(12, dtype=jnp.int32) % 50).reshape(2, 6) + 1
    cache = init_cache(CFG, 2, 16)
    logits_ref, cache_ref = jax.jit(
        lambda p, t, c: transformer.forward(CFG, p, t, c))(params, toks, cache)

    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sc = jax.device_put(cache, jax.tree.map(
            lambda s: NamedSharding(mesh, s), cache_specs()))
        st = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
        logits_sh, cache_sh = jax.jit(
            lambda p, t, c: transformer.forward(CFG, p, t, c))(sp, st, sc)

    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(cache_sh.k), np.asarray(cache_ref.k), rtol=2e-4, atol=2e-4)


def test_sharded_generate_runs(mesh):
    """Full speculative generate with TP-sharded target on the CPU mesh."""
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3,
                                               num_drafts=2),
                       max_new_tokens=8)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    gen = make_generate(CFG, CFG, eng)
    res_1dev = gen(pd, pt, prompt, jnp.int32(8), jax.random.PRNGKey(3))

    with jax.set_mesh(mesh):
        spt = shard_params(pt, mesh)
        spd = replicate(pd, mesh)
        res = gen(spd, spt, prompt, jnp.int32(8), jax.random.PRNGKey(3))
    assert int(res.ncommit) >= 1
    # same PRNG keys + same math => identical commitments up to numerics
    n = min(int(res.length), int(res_1dev.length))
    agree = (np.asarray(res.tokens)[:n] == np.asarray(res_1dev.tokens)[:n]).mean()
    assert agree > 0.9, agree


def test_sharded_logits_allgather_present(mesh):
    """North-star wiring check (BASELINE.json): with the lm_head vocab-sharded
    over `model`, the compiled forward all-gathers the verification logits
    (tiny: gamma+1 rows) while weight matmuls stay sharded — and the KV path
    stays collective-free (separate test)."""
    params = init_params(CFG, jax.random.PRNGKey(0))
    toks = (jnp.arange(8, dtype=jnp.int32) % 50).reshape(1, 8)
    cache = init_cache(CFG, 1, 16)
    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sc = jax.device_put(cache, jax.tree.map(
            lambda s: NamedSharding(mesh, s), cache_specs()))
        fn = jax.jit(lambda p, t, c: transformer.forward(CFG, p, t, c)[0])
        txt = fn.lower(sp, toks, sc).compile().as_text()
    assert "all-gather" in txt or "all-reduce" in txt, \
        "expected a collective materializing full-vocab logits"


def test_sharded_kv_rollback_is_local(mesh):
    """Rollback must not introduce cross-device communication: the compiled
    HLO for rollback on a sharded cache contains no collectives."""
    from hsd_tpu.engine.kvcache import rollback
    cache = init_cache(CFG, 2, 32)
    with jax.set_mesh(mesh):
        sc = jax.device_put(cache, jax.tree.map(
            lambda s: NamedSharding(mesh, s), cache_specs()))
        fn = jax.jit(lambda c: rollback(c, jnp.int32(5)))
        txt = fn.lower(sc).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute", "all-to-all"):
        assert coll not in txt, f"rollback emits {coll}"


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host bring-up helpers."""
    import jax
    from hsd_tpu.parallel import (initialize_multihost, make_global_mesh,
                                  shard_for_process)
    assert initialize_multihost() == jax.process_index()
    mesh = make_global_mesh(model=min(4, len(jax.devices())))
    assert mesh.devices.size == len(jax.devices())
    # contiguous, covering, disjoint fan-out
    items = list(range(11))
    parts = [shard_for_process(items, i, 3) for i in range(3)]
    assert sum(parts, []) == items


def test_sharded_forward_packed_int4(mesh):
    """TP sharding composes with packed-int4 weights: uint8 nibble
    containers shard with the dense layout (column-parallel on out,
    row-parallel on packed-in); scales/zeros follow. Constraint: for
    row-parallel matrices the GROUP axis is what shards, so
    (din / group_size) % tp_degree == 0 (e.g. 14B gs=128 supports TP<=8;
    use gs=64 for TP=16). The sharded forward must match the single-device
    quantized forward."""
    from hsd_tpu.ops.linear import quantize

    params = init_params(CFG, jax.random.PRNGKey(0))
    q4 = {}
    for k, v in params.layers.items():
        if k.startswith("w"):
            q4[k] = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[quantize(v[i], bits=4, group_size=16)
                  for i in range(v.shape[0])])
        else:
            q4[k] = v
    p4 = params._replace(layers=q4)
    toks = (jnp.arange(12, dtype=jnp.int32) % 50).reshape(2, 6) + 1
    cache = init_cache(CFG, 2, 16)
    logits_ref, _ = jax.jit(
        lambda p, t, c: transformer.forward(CFG, p, t, c))(p4, toks, cache)

    with jax.set_mesh(mesh):
        sp = shard_params(p4, mesh)
        sc = jax.device_put(cache, jax.tree.map(
            lambda s: NamedSharding(mesh, s), cache_specs()))
        st = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
        logits_sh, _ = jax.jit(
            lambda p, t, c: transformer.forward(CFG, p, t, c))(sp, st, sc)

    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)
