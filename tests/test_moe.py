"""Sparse-MoE (Mixtral family) decoder tests.

The reference vendors a tree-attention Mixtral
(EAGLE-3H/eagle/model/modeling_mixtral_kv.py:426-516) whose MoE block loops
over experts with host-synced index lists. Here the MoE block is a
fixed-shape all-expert einsum (models/transformer._moe_ffn); these tests pin
it against a straightforward per-token top-k reference loop, check KV-cache
decode consistency, end-to-end speculative decoding with an MoE target, and
both sharded layouts (TP-inside-experts and expert-parallel) on the CPU mesh.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import init_cache, make_generate
from hsd_tpu.models import init_params, transformer
from hsd_tpu.models.transformer import _moe_ffn
from hsd_tpu.parallel import make_mesh, shard_params, cache_specs
from jax.sharding import NamedSharding, PartitionSpec as P

CFG = ModelConfig.tiny_moe(vocab_size=256, num_heads=8, num_kv_heads=4,
                           hidden_size=64, intermediate_size=96)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_moe_ffn_matches_per_token_loop():
    """_moe_ffn == the reference's per-token top-k routing semantics
    (modeling_mixtral_kv.py:477-513: fp32 softmax over all experts, top-k,
    renormalize over the selected k, weighted sum of expert SwiGLUs)."""
    rng = np.random.default_rng(0)
    N, D, F, E, K = 7, 16, 24, 4, 2
    cfg = ModelConfig.tiny_moe(hidden_size=D, intermediate_size=F,
                               num_experts=E, num_experts_per_tok=K)
    h = rng.normal(size=(1, N, D)).astype(np.float32)
    lp = dict(
        gate=rng.normal(size=(D, E)).astype(np.float32),
        wgate=rng.normal(size=(E, D, F)).astype(np.float32) * 0.2,
        wup=rng.normal(size=(E, D, F)).astype(np.float32) * 0.2,
        wdown=rng.normal(size=(E, F, D)).astype(np.float32) * 0.2,
    )
    got = np.asarray(_moe_ffn(cfg, {k: jnp.asarray(v) for k, v in lp.items()},
                              jnp.asarray(h)))[0]

    x = h[0]
    probs = _softmax(x @ lp["gate"])
    want = np.zeros_like(x)
    for n in range(N):
        idx = np.argsort(-probs[n])[:K]
        w = probs[n, idx]
        w = w / w.sum()
        for wj, e in zip(w, idx):
            a = (x[n] @ lp["wgate"][e])
            a = a / (1 + np.exp(-a)) * (x[n] @ lp["wup"][e])
            want[n] += wj * (a @ lp["wdown"][e])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_decode_matches_prefill():
    """KV-cache consistency: logits from one 8-token prefill == logits from
    a 5-token prefill followed by a 3-token append."""
    params = init_params(CFG, jax.random.PRNGKey(0))
    toks = (jnp.arange(8, dtype=jnp.int32) % 50).reshape(1, 8) + 1
    fwd = jax.jit(lambda p, t, c: transformer.forward(CFG, p, t, c))

    full, _ = fwd(params, toks, init_cache(CFG, 1, 16))
    c = init_cache(CFG, 1, 16)
    _, c = fwd(params, toks[:, :5], c)
    part, _ = fwd(params, toks[:, 5:], c)
    np.testing.assert_allclose(np.asarray(part), np.asarray(full[:, 5:]),
                               rtol=2e-4, atol=2e-4)


def test_moe_speculative_generate_deterministic():
    """End-to-end HSD speculative decode with an MoE target runs and is
    deterministic under a fixed key."""
    draft_cfg = ModelConfig.tiny(vocab_size=256)
    pd = init_params(draft_cfg, jax.random.PRNGKey(0))
    pt = init_params(CFG, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                       max_new_tokens=12)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    gen = make_generate(draft_cfg, CFG, eng)
    r1 = gen(pd, pt, prompt, jnp.int32(8), jax.random.PRNGKey(7))
    r2 = gen(pd, pt, prompt, jnp.int32(8), jax.random.PRNGKey(7))
    assert int(r1.length) > 8
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


@pytest.mark.parametrize("expert_parallel", [False, True])
def test_moe_sharded_matches_single(expert_parallel):
    """TP-inside-experts and expert-parallel layouts both reproduce the
    single-device forward on the 8-device CPU mesh."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(data=2, model=4)
    params = init_params(CFG, jax.random.PRNGKey(0))
    toks = (jnp.arange(12, dtype=jnp.int32) % 50).reshape(2, 6) + 1
    cache = init_cache(CFG, 2, 16)
    ref, _ = jax.jit(lambda p, t, c: transformer.forward(CFG, p, t, c))(
        params, toks, cache)

    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh, expert_parallel=expert_parallel)
        sc = jax.device_put(cache, jax.tree.map(
            lambda s: NamedSharding(mesh, s), cache_specs()))
        st = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
        got, _ = jax.jit(lambda p, t, c: transformer.forward(CFG, p, t, c))(
            sp, st, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_eagle_over_moe_base_greedy_equals_ar():
    """EAGLE trie decoding over a Mixtral-style MoE base: greedy must
    reproduce the base model's greedy chain exactly (the reference's Mixtral
    exists precisely as the tree-attention base for EAGLE,
    modeling_mixtral_kv.py:769-773 tree_mask injection)."""
    from hsd_tpu.engine import make_autoregressive
    from hsd_tpu.engine.eagle_engine import make_eagle_generate
    from hsd_tpu.models.eagle import EagleConfig, init_eagle_params

    tcfg = ModelConfig.tiny_moe(vocab_size=64, hidden_size=32,
                                intermediate_size=64, num_layers=4,
                                num_heads=4, num_kv_heads=2)
    ecfg = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                       num_kv_heads=2, vocab_size=64, draft_vocab_size=64,
                       intermediate_size=64, top_k=4, depth=3,
                       total_tokens=11, dtype=jnp.float32, rope_theta=10000.0)
    pt = init_params(tcfg, jax.random.PRNGKey(0))
    pe = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    eng = EngineConfig(max_new_tokens=10, temperature=0.0)
    res = make_eagle_generate(tcfg, ecfg, eng, mode="greedy")(
        pt, pe, prompt, jnp.int32(8), jax.random.PRNGKey(5))
    t_ar, l_ar = make_autoregressive(tcfg, eng)(
        pt, prompt, jnp.int32(8), jax.random.PRNGKey(6))
    n = min(int(res.length), int(l_ar))
    assert n > 8
    np.testing.assert_array_equal(np.asarray(res.tokens)[8:n],
                                  np.asarray(t_ar)[8:n])


def test_mixtral_checkpoint_loader(tmp_path):
    """Round-trip a synthetic Mixtral-layout safetensors checkpoint
    (block_sparse_moe.gate + experts.{e}.w1/w3/w2 naming,
    ref: modeling_mixtral_kv.py:432-434,469-471)."""
    from safetensors.numpy import save_file
    from hsd_tpu.models.loader import load_hf

    rng = np.random.default_rng(3)
    D, F, E, L, V, H, Hkv = 16, 24, 4, 2, 64, 4, 2
    hd = D // H
    t = {
        "model.embed_tokens.weight": rng.normal(size=(V, D)),
        "lm_head.weight": rng.normal(size=(V, D)),
        "model.norm.weight": np.ones(D),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(D)
        t[p + "post_attention_layernorm.weight"] = np.ones(D)
        t[p + "self_attn.q_proj.weight"] = rng.normal(size=(H * hd, D))
        t[p + "self_attn.k_proj.weight"] = rng.normal(size=(Hkv * hd, D))
        t[p + "self_attn.v_proj.weight"] = rng.normal(size=(Hkv * hd, D))
        t[p + "self_attn.o_proj.weight"] = rng.normal(size=(D, H * hd))
        t[p + "block_sparse_moe.gate.weight"] = rng.normal(size=(E, D))
        for e in range(E):
            q = p + f"block_sparse_moe.experts.{e}."
            t[q + "w1.weight"] = rng.normal(size=(F, D)) * 0.2
            t[q + "w3.weight"] = rng.normal(size=(F, D)) * 0.2
            t[q + "w2.weight"] = rng.normal(size=(D, F)) * 0.2
    t = {k: np.asarray(v, np.float32) for k, v in t.items()}
    save_file(t, str(tmp_path / "model.safetensors"))
    import json
    (tmp_path / "config.json").write_text(json.dumps(dict(
        model_type="mixtral", vocab_size=V, hidden_size=D,
        intermediate_size=F, num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=Hkv, rope_theta=1e6, rms_norm_eps=1e-5,
        tie_word_embeddings=False, num_local_experts=E,
        num_experts_per_tok=2, eos_token_id=2)))

    cfg, params = load_hf(str(tmp_path))
    assert cfg.num_experts == E and cfg.num_experts_per_tok == 2
    assert params.layers["gate"].shape == (L, D, E)
    assert params.layers["wgate"].shape == (L, E, D, F)
    assert params.layers["wdown"].shape == (L, E, F, D)
    # gate must be the transpose of the stored [E, D] matrix
    np.testing.assert_allclose(
        np.asarray(params.layers["gate"][0]),
        t["model.layers.0.block_sparse_moe.gate.weight"].T, rtol=1e-6)

    toks = (jnp.arange(6, dtype=jnp.int32) % (V - 2)).reshape(1, 6) + 1
    cfg_f32 = dataclasses_replace_dtype(cfg)
    logits, _ = jax.jit(lambda p, tk, c: transformer.forward(
        cfg_f32, p, tk, c))(params, toks, init_cache(cfg_f32, 1, 8))
    assert np.isfinite(np.asarray(logits)).all()


def dataclasses_replace_dtype(cfg):
    import dataclasses
    return dataclasses.replace(cfg, dtype=jnp.float32)
