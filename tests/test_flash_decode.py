"""Parity tests for the flash-decode attention kernel (interpret mode on the
CPU mesh) against the einsum reference path in models/transformer._attention.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.models.transformer import _attention
from hsd_tpu.ops.flash_decode import flash_attention_decode


def _mk(key, T, H, Hkv, d, S, dtype):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (1, T, H, d), dtype)
    k = jax.random.normal(ks[1], (1, S, Hkv, d), dtype)
    v = jax.random.normal(ks[2], (1, S, Hkv, d), dtype)
    return q, k, v


@pytest.mark.parametrize("T,H,Hkv,d,S,kv_len,start", [
    (1, 8, 2, 64, 300, 200, 0),      # AR decode, ragged S vs block
    (11, 8, 2, 64, 256, 97, 3),      # spec-verify block, left-padded
    (4, 4, 4, 128, 640, 500, 0),     # MHA (rep=1)
])
def test_flash_matches_einsum(T, H, Hkv, d, S, kv_len, start):
    q, k, v = _mk(jax.random.PRNGKey(0), T, H, Hkv, d, S, jnp.float32)
    q_index = (kv_len + jnp.arange(T, dtype=jnp.int32))[None, :]
    st = jnp.array([start], jnp.int32)
    ref = _attention(q, k, v, q_index, jnp.int32(kv_len), st, None)
    out = flash_attention_decode(q, k, v, q_index, jnp.int32(kv_len), st,
                                 None, block_s=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_tree_bias():
    """Tree attention: the [T, T] additive bias lands on cache slots
    [kv_len, kv_len + T) — EAGLE trie / striped-draft geometry."""
    T, H, Hkv, d, S, kv_len = 6, 8, 2, 64, 200, 50
    q, k, v = _mk(jax.random.PRNGKey(1), T, H, Hkv, d, S, jnp.float32)
    # a trie mask: node i attends to its ancestor chain
    anc = np.tril(np.random.RandomState(0).rand(T, T) < 0.6)
    np.fill_diagonal(anc, True)
    bias = jnp.where(jnp.asarray(anc), 0.0, -1e30).astype(jnp.float32)
    q_index = (kv_len + jnp.arange(T, dtype=jnp.int32))[None, :]
    st = jnp.zeros((1,), jnp.int32)
    ref = _attention(q, k, v, q_index, jnp.int32(kv_len), st, bias)
    out = flash_attention_decode(q, k, v, q_index, jnp.int32(kv_len), st,
                                 bias, block_s=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T,H,Hkv,d,S,kv_len,start", [
    (1, 8, 2, 128, 300, 200, 0),     # AR decode
    (3, 8, 2, 64, 256, 97, 3),       # small-T, left-padded
])
def test_fused_rope_matches_rope_then_einsum(T, H, Hkv, d, S, kv_len,
                                             start):
    """rope=(cos, sin): the kernel consumes RAW q and must match
    _rope_apply + einsum attention."""
    from hsd_tpu.models.transformer import _rope_apply, _rope_tables
    q, k, v = _mk(jax.random.PRNGKey(5), T, H, Hkv, d, S, jnp.float32)
    q_index = (kv_len + jnp.arange(T, dtype=jnp.int32))[None, :]
    st = jnp.array([start], jnp.int32)
    positions = q_index - start
    tables = _rope_tables(positions, d, 10000.0)
    ref = _attention(_rope_apply(q, tables), k, v, q_index,
                     jnp.int32(kv_len), st, None)
    out = flash_attention_decode(q, k, v, q_index, jnp.int32(kv_len), st,
                                 None, rope=tables, block_s=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_rope_forward_e2e_parity(monkeypatch):
    """transformer.forward with HSD_TPU_FUSED_ATTN=always equals the
    default einsum path at f32 on a tiny decode step."""
    import hsd_tpu.models.transformer as tr
    import hsd_tpu.ops.flash_decode as fd
    from hsd_tpu.config import ModelConfig
    from hsd_tpu.engine.kvcache import init_cache
    from hsd_tpu.models import init_params

    # head_dim must be 64/128 for the kernel: 256/4 = 64
    cfg = ModelConfig.tiny(vocab_size=64, hidden_size=256,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    cache = init_cache(cfg, 1, 160)
    prompt = jnp.arange(1, 140, dtype=jnp.int32)[None, :]
    logits0, cache0 = tr.forward(cfg, params, prompt, cache)
    tok = jnp.asarray([[7]], jnp.int32)
    ref, _ = tr.forward(cfg, params, tok, cache0)
    monkeypatch.setattr(fd, "FUSED_ATTN", "always")
    out, _ = tr.forward(cfg, params, tok, cache0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_flash_bf16_matches_reference_cast():
    """bf16 inputs: both paths do fp32 softmax with a bf16 PV cast."""
    T, H, Hkv, d, S, kv_len = 2, 8, 2, 128, 384, 301
    q, k, v = _mk(jax.random.PRNGKey(2), T, H, Hkv, d, S, jnp.bfloat16)
    q_index = (kv_len + jnp.arange(T, dtype=jnp.int32))[None, :]
    st = jnp.zeros((1,), jnp.int32)
    ref = _attention(q, k, v, q_index, jnp.int32(kv_len), st, None)
    out = flash_attention_decode(q, k, v, q_index, jnp.int32(kv_len), st,
                                 None, block_s=256)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fully_masked_row():
    """Pin the DOCUMENTED divergence on fully-masked query rows (q_index <
    start, i.e. no valid key): the kernel outputs zeros, the einsum path's
    softmax over all -1e30 scores yields the uniform mean of V. Unreachable
    from current decode call sites — this test exists so a future caller with
    padded rows hits the difference deliberately (ADVICE r2)."""
    T, H, Hkv, d, S, kv_len, start = 2, 4, 2, 64, 128, 40, 8
    q, k, v = _mk(jax.random.PRNGKey(3), T, H, Hkv, d, S, jnp.float32)
    # row 0 valid (q_index >= start); row 1 fully masked (q_index < start)
    q_index = jnp.array([[kv_len, start - 2]], jnp.int32)
    st = jnp.array([start], jnp.int32)
    ref = _attention(q, k, v, q_index, jnp.int32(kv_len), st, None)
    out = flash_attention_decode(q, k, v, q_index, jnp.int32(kv_len), st,
                                 None, block_s=64)
    # valid row agrees
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(ref[0, 0]),
                               rtol=2e-5, atol=2e-5)
    # masked row: kernel = zeros; einsum = softmax over uniformly -1e30
    # scores = uniform over ALL S slots -> mean of V — the documented,
    # deliberate difference
    np.testing.assert_allclose(np.asarray(out[0, 1]), 0.0, atol=1e-6)
    mean_v = np.asarray(jnp.mean(v[0], axis=0))          # [Hkv, d]
    rep = H // Hkv
    mean_full = np.repeat(mean_v, rep, axis=0)           # [H, d]
    np.testing.assert_allclose(np.asarray(ref[0, 1]), mean_full,
                               rtol=2e-5, atol=2e-5)


def test_flash_engine_e2e_parity():
    """Whole-generate parity: HSD_TPU_FLASH_DECODE=always routes every
    decode-path attention through the kernel (interpret mode on CPU); the
    committed token stream must be distributionally identical — here we pin
    EXACT token equality on the greedy path, where attention numerics are
    the only possible divergence."""
    import hsd_tpu.ops.flash_decode as fd
    from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
    from hsd_tpu.engine import make_generate
    from hsd_tpu.models import init_params

    # head_dim 64 and cache >= 128 slots so use_flash's shape gate passes
    cfg = ModelConfig(vocab_size=128, hidden_size=256, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      max_position_embeddings=512, dtype=jnp.float32)
    eng = EngineConfig(verifier=VerifierConfig(method="greedy", gamma=3),
                       max_new_tokens=16, temperature=0.0)
    params = init_params(cfg, jax.random.PRNGKey(0))
    prompt = jnp.arange(128, dtype=jnp.int32) % 100 + 2
    plen = jnp.int32(128)
    gen = make_generate(cfg, cfg, eng)
    r_ref = gen(params, params, prompt, plen, jax.random.PRNGKey(1))
    old = fd.FLASH_DECODE
    fd.FLASH_DECODE = "always"
    try:
        gen2 = make_generate(cfg, cfg, eng)
        r_fl = gen2(params, params, prompt, plen, jax.random.PRNGKey(1))
    finally:
        fd.FLASH_DECODE = old
    n = int(r_ref.length)
    assert int(r_fl.length) == n
    np.testing.assert_array_equal(np.asarray(r_ref.tokens[:n]),
                                  np.asarray(r_fl.tokens[:n]))
