"""shard_map tensor parallelism with LOCAL Pallas kernels (parallel/tp.py).

The GSPMD TP path (tests/test_sharding.py) cannot partition the Pallas
custom call; this is the production path where every chip runs the
single-chip program — Pallas dequant+matmul kernels included (interpret
mode on the CPU mesh) — on its Megatron shard with explicit psums.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import ModelConfig
from hsd_tpu.engine import init_cache
from hsd_tpu.models import init_params, transformer
from hsd_tpu.ops.linear import QuantizedLinear, quantize
from hsd_tpu.parallel import make_mesh
from hsd_tpu.parallel.tp import make_tp_forward, shard_params_tp

# geometry chosen so LOCAL shards stay Pallas-legal at tp=4: group_size 128
# (kernel constraint) => in-sharded weights need in >= 4*128; out shards
# must stay 128-multiples
CFG = dataclasses.replace(
    ModelConfig.tiny(vocab_size=512, num_heads=8, num_kv_heads=4,
                     hidden_size=512, intermediate_size=512, num_layers=2),
    tie_word_embeddings=False, attention_bias=False, gptq_path="pallas")


def _quantize_params(cfg, params, gs=128):
    """Per-layer int8-quantize the big matmuls (stacked codes)."""
    dl = dict(params.layers)
    for name in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        w = params.layers[name]
        qs = [quantize(w[i].astype(jnp.float32), group_size=gs)
              for i in range(w.shape[0])]
        dl[name] = QuantizedLinear(
            qweight=jnp.stack([q.qweight for q in qs]),
            scales=jnp.stack([q.scales for q in qs]),
            zeros=jnp.stack([q.zeros for q in qs]))
    lm = quantize(params.lm_head.astype(jnp.float32), group_size=gs)
    return params._replace(layers=dl, lm_head=lm)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(data=1, model=4)


def test_tp_pallas_forward_matches_single(mesh):
    """Quantized forward through shard_map + interpret-Pallas on 4 model
    shards == the single-device forward (same kernels, same math)."""
    params = _quantize_params(CFG, init_params(CFG, jax.random.PRNGKey(0)))
    toks = (jnp.arange(10, dtype=jnp.int32) % 400).reshape(1, 10) + 1
    cache = init_cache(CFG, 1, 16)
    ref, ref_cache = jax.jit(
        lambda p, t, c: transformer.forward(CFG, p, t, c))(params, toks,
                                                           cache)
    with jax.set_mesh(mesh):
        sp = shard_params_tp(params, mesh)
        fwd = make_tp_forward(CFG, params)
        got, got_cache = fwd(sp, toks, cache)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(got_cache.k, np.float32),
                               np.asarray(ref_cache.k, np.float32),
                               rtol=3e-3, atol=3e-3)


def test_tp_pallas_decode_matches_prefill(mesh):
    """KV-cache consistency under shard_map TP: one 8-token prefill ==
    5-token prefill + 3-token append (local kv-head shards, local
    append)."""
    params = _quantize_params(CFG, init_params(CFG, jax.random.PRNGKey(1)))
    toks = (jnp.arange(8, dtype=jnp.int32) % 200).reshape(1, 8) + 1
    with jax.set_mesh(mesh):
        sp = shard_params_tp(params, mesh)
        fwd = make_tp_forward(CFG, params)
        full, _ = fwd(sp, toks, init_cache(CFG, 1, 16))
        c = init_cache(CFG, 1, 16)
        _, c = fwd(sp, toks[:, :5], c)
        part, _ = fwd(sp, toks[:, 5:], c)
    np.testing.assert_allclose(np.asarray(part, np.float32),
                               np.asarray(full[:, 5:], np.float32),
                               rtol=3e-3, atol=3e-3)


def test_tp_moe_expert_parallel_matches_single(mesh):
    """Dense MoE target under shard_map expert parallelism: each shard
    computes its local experts, psum combines — must equal single-device."""
    cfg = dataclasses.replace(
        ModelConfig.tiny_moe(vocab_size=256, num_heads=8, num_kv_heads=4,
                             hidden_size=64, intermediate_size=96,
                             num_experts=8),
        tie_word_embeddings=False)
    params = init_params(cfg, jax.random.PRNGKey(2))
    toks = (jnp.arange(10, dtype=jnp.int32) % 200).reshape(1, 10) + 1
    cache = init_cache(cfg, 1, 16)
    ref, _ = jax.jit(
        lambda p, t, c: transformer.forward(cfg, p, t, c))(params, toks,
                                                           cache)
    with jax.set_mesh(mesh):
        sp = shard_params_tp(params, mesh)
        fwd = make_tp_forward(cfg, params)
        got, _ = fwd(sp, toks, cache)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_tp_speculative_generate_greedy_equals_ar(mesh):
    """Full speculative decode with the TP shard_map target (local Pallas
    kernels) inside the engine's while loop: greedy speculative output must
    equal the plain single-device greedy AR chain."""
    from hsd_tpu.config import EngineConfig, VerifierConfig
    from hsd_tpu.engine import make_autoregressive, make_generate
    from hsd_tpu.parallel.tp import make_tp_target_forward

    params_t = _quantize_params(CFG, init_params(CFG, jax.random.PRNGKey(3)))
    draft_cfg = ModelConfig.tiny(vocab_size=512)
    params_d = init_params(draft_cfg, jax.random.PRNGKey(4))
    eng = EngineConfig(verifier=VerifierConfig(method="greedy", gamma=3),
                       max_new_tokens=8, temperature=0.0)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 400) + 1
    with jax.set_mesh(mesh):
        sp = shard_params_tp(params_t, mesh)
        gen = make_generate(draft_cfg, CFG, eng,
                            target_forward=make_tp_target_forward(CFG,
                                                                  params_t))
        res = gen(params_d, sp, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    t_ar, l_ar = make_autoregressive(CFG, eng)(params_t, prompt, jnp.int32(8),
                                               jax.random.PRNGKey(6))
    n = min(int(res.length), int(l_ar))
    assert n > 8
    np.testing.assert_array_equal(np.asarray(res.tokens)[8:n],
                                  np.asarray(t_ar)[8:n])


def test_tp_speculative_generate_hsd_deterministic(mesh):
    """HSD sampling through the TP target is deterministic under a fixed
    key and commits the full budget or stops at EOS."""
    from hsd_tpu.config import EngineConfig, VerifierConfig
    from hsd_tpu.engine import make_generate
    from hsd_tpu.parallel.tp import make_tp_target_forward

    params_t = _quantize_params(CFG, init_params(CFG, jax.random.PRNGKey(7)))
    draft_cfg = ModelConfig.tiny(vocab_size=512)
    params_d = init_params(draft_cfg, jax.random.PRNGKey(8))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                       max_new_tokens=8)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 400) + 1
    with jax.set_mesh(mesh):
        sp = shard_params_tp(params_t, mesh)
        gen = make_generate(draft_cfg, CFG, eng,
                            target_forward=make_tp_target_forward(CFG,
                                                                  params_t))
        r1 = gen(params_d, sp, prompt, jnp.int32(8), jax.random.PRNGKey(9))
        r2 = gen(params_d, sp, prompt, jnp.int32(8), jax.random.PRNGKey(9))
    assert int(r1.ncommit) >= 1
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_tp_speculative_multidraft(mesh):
    """K=4 parallel multidraft through the TP target: the target forward
    sees R=4 replicated rows; row-select rollback composes with the
    kv-head-sharded cache."""
    from hsd_tpu.config import EngineConfig, VerifierConfig
    from hsd_tpu.engine import make_generate
    from hsd_tpu.parallel.tp import make_tp_target_forward

    params_t = _quantize_params(CFG, init_params(CFG, jax.random.PRNGKey(10)))
    draft_cfg = ModelConfig.tiny(vocab_size=512)
    params_d = init_params(draft_cfg, jax.random.PRNGKey(11))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3,
                                               num_drafts=4),
                       max_new_tokens=8)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 400) + 1
    with jax.set_mesh(mesh):
        sp = shard_params_tp(params_t, mesh)
        gen = make_generate(draft_cfg, CFG, eng,
                            target_forward=make_tp_target_forward(CFG,
                                                                  params_t))
        res = gen(params_d, sp, prompt, jnp.int32(8), jax.random.PRNGKey(12))
    assert int(res.ncommit) >= 1
    toks = np.asarray(res.tokens)[8:8 + int(res.ncommit)]
    assert ((toks >= 0) & (toks < 512)).all()


def test_tp_eagle_greedy_equals_ar(mesh):
    """EAGLE trie decoding with the TP shard_map base model: greedy must
    reproduce the single-device greedy AR chain (trie build on the
    replicated head, tree-masked TP forward, KV compaction on local
    kv-head shards)."""
    from hsd_tpu.config import EngineConfig
    from hsd_tpu.engine import make_autoregressive
    from hsd_tpu.engine.eagle_engine import (default_feature_layers,
                                             make_eagle_generate)
    from hsd_tpu.models.eagle import EagleConfig, init_eagle_params
    from hsd_tpu.parallel.tp import make_tp_eagle_forward

    tcfg = dataclasses.replace(
        ModelConfig.tiny(vocab_size=512, num_heads=8, num_kv_heads=4,
                         hidden_size=512, intermediate_size=512,
                         num_layers=4),
        tie_word_embeddings=False, attention_bias=False)
    ecfg = EagleConfig(hidden_size=64, target_hidden_size=512, num_heads=4,
                       num_kv_heads=2, vocab_size=512, draft_vocab_size=512,
                       intermediate_size=64, top_k=4, depth=3,
                       total_tokens=11, dtype=jnp.float32,
                       rope_theta=10000.0)
    pt = init_params(tcfg, jax.random.PRNGKey(0))
    pe = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    prompt = (jnp.arange(8, dtype=jnp.int32) % 400) + 1
    eng = EngineConfig(max_new_tokens=8, temperature=0.0)
    with jax.set_mesh(mesh):
        sp = shard_params_tp(pt, mesh)
        gen = make_eagle_generate(
            tcfg, ecfg, eng, mode="greedy",
            target_forward=make_tp_eagle_forward(
                tcfg, pt, default_feature_layers(tcfg)))
        res = gen(sp, pe, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    t_ar, l_ar = make_autoregressive(tcfg, eng)(pt, prompt, jnp.int32(8),
                                                jax.random.PRNGKey(6))
    n = min(int(res.length), int(l_ar))
    assert n > 8
    np.testing.assert_array_equal(np.asarray(res.tokens)[8:n],
                                  np.asarray(t_ar)[8:n])
