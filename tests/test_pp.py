"""Pipeline parallelism (parallel/pp.py) on the virtual CPU mesh.

Pins: PP forward == single-device forward (logits + cache length), for
pipe in {2, 4}, dense and quantized stacks; PP target plugged into the
full speculative engine decodes the SAME tokens as the single-device run.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import init_cache, make_generate
from hsd_tpu.models import init_params, transformer
from hsd_tpu.parallel.pp import (make_pp_mesh, make_pp_target_forward,
                                 pp_cache_specs, shard_params_pp)

CFG = ModelConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_layers=4, num_heads=4, num_kv_heads=2)


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_forward_matches_single(pp):
    pt = init_params(CFG, jax.random.PRNGKey(0))
    toks = (jnp.arange(6, dtype=jnp.int32) % 50)[None, :] + 1
    ref_logits, ref_cache = transformer.forward(CFG, pt, toks,
                                                init_cache(CFG, 1, 16))
    mesh = make_pp_mesh(pp)
    with jax.set_mesh(mesh):
        ppt = shard_params_pp(pt, mesh)
        fwd = make_pp_target_forward(CFG, ppt, pp)
        logits, cache = jax.jit(fwd)(ppt, toks, init_cache(CFG, 1, 16))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
    assert int(cache.length) == int(ref_cache.length)
    # per-stage KV: every layer's cache rows must match the single-device run
    np.testing.assert_allclose(np.asarray(cache.k), np.asarray(ref_cache.k),
                               rtol=2e-2, atol=2e-2)


def test_pp_forward_quantized_stack():
    """Quantized layer-stacked weights run under PP (local Pallas-compatible
    [L/pp, ...] slices; interpret mode on CPU)."""
    from hsd_tpu.ops.linear import quantize

    pt = init_params(ModelConfig.tiny(vocab_size=64, hidden_size=256,
                                      intermediate_size=256, num_layers=2,
                                      num_heads=4, num_kv_heads=4,
                                      head_dim=64),
                     jax.random.PRNGKey(1))
    cfg = ModelConfig.tiny(vocab_size=64, hidden_size=256,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=64)
    qlayers = dict(pt.layers)
    for name in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        w = pt.layers[name]
        qlayers[name] = jax.vmap(
            lambda wi: quantize(wi.astype(jnp.float32), bits=8,
                                group_size=128))(w.astype(jnp.float32))
    qt = pt._replace(layers=qlayers)
    toks = (jnp.arange(5, dtype=jnp.int32) % 50)[None, :] + 1
    ref, _ = transformer.forward(cfg, qt, toks, init_cache(cfg, 1, 8))
    mesh = make_pp_mesh(2)
    with jax.set_mesh(mesh):
        qts = shard_params_pp(qt, mesh)
        fwd = make_pp_target_forward(cfg, qts, 2)
        logits, _ = jax.jit(fwd)(qts, toks, init_cache(cfg, 1, 8))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pp_speculative_engine_matches_single():
    """The PP target inside make_generate: same committed tokens as the
    single-device engine on the same key (the PP forward is numerically the
    same program, so the whole stochastic trajectory must agree)."""
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                       max_new_tokens=10)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    ref = make_generate(CFG, CFG, eng)(pd, pt, prompt, jnp.int32(8),
                                       jax.random.PRNGKey(5))
    mesh = make_pp_mesh(2)
    with jax.set_mesh(mesh):
        pts = shard_params_pp(pt, mesh)
        fwd = make_pp_target_forward(CFG, pts, 2)
        gen = make_generate(CFG, CFG, eng, target_forward=fwd)
        res = gen(pd, pts, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    n_ref, n_pp = int(ref.length), int(res.length)
    assert n_pp == n_ref
    np.testing.assert_array_equal(np.asarray(res.tokens)[:n_pp],
                                  np.asarray(ref.tokens)[:n_ref])


def test_pp_tp_forward_matches_single():
    """PP x TP composition (pipe=2 x model=2 on 4 CPU devices): logits match
    the single-device forward; engine decode matches token-for-token."""
    from hsd_tpu.parallel.pp import (make_pp_tp_mesh,
                                     make_pp_tp_target_forward,
                                     shard_params_pp_tp)
    cfg = dataclasses.replace(CFG, tie_word_embeddings=False)
    pt = init_params(cfg, jax.random.PRNGKey(1))
    toks = (jnp.arange(6, dtype=jnp.int32) % 50)[None, :] + 1
    ref, ref_cache = transformer.forward(cfg, pt, toks, init_cache(cfg, 1, 16))
    mesh = make_pp_tp_mesh(2, 2)
    with jax.set_mesh(mesh):
        pts = shard_params_pp_tp(pt, mesh)
        fwd = make_pp_tp_target_forward(cfg, pts, 2)
        logits, cache = jax.jit(fwd)(pts, toks, init_cache(cfg, 1, 16))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert int(cache.length) == int(ref_cache.length)

    pd = init_params(CFG, jax.random.PRNGKey(0))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                       max_new_tokens=8)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 20) + 1
    ref_res = make_generate(CFG, cfg, eng)(pd, pt, prompt, jnp.int32(8),
                                           jax.random.PRNGKey(5))
    with jax.set_mesh(mesh):
        gen = make_generate(CFG, cfg, eng, target_forward=fwd)
        res = gen(pd, pts, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    n = int(res.length)
    assert n == int(ref_res.length)
    np.testing.assert_array_equal(np.asarray(res.tokens)[:n],
                                  np.asarray(ref_res.tokens)[:n])
