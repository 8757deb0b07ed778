"""HF checkpoint loader tests against synthetic checkpoints (no network)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import ModelConfig
from hsd_tpu.engine import init_cache
from hsd_tpu.models import transformer
from hsd_tpu.models.loader import (_gptq_linear, _unpack_gptq_int32,
                                   config_from_hf, load_hf)
from hsd_tpu.ops.linear import dequantize


def _write_synthetic_ckpt(tmp_path, cfg: ModelConfig, quantized=None):
    """Emit an HF-style safetensors checkpoint with random weights."""
    from safetensors import numpy as stnp

    rng = np.random.default_rng(0)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    t = {}

    def dense(name, dout, din):
        t[name + ".weight"] = rng.normal(0, 0.02, (dout, din)).astype(np.float32)

    def gptq(name, dout, din, bits):
        gs = 128
        per = 32 // bits
        codes = rng.integers(0, 1 << bits, (din, dout), dtype=np.uint32)
        packed = np.zeros((din // per, dout), np.uint32)
        for j in range(per):
            packed |= codes[j::per] << (bits * j)
        t[name + ".qweight"] = packed.view(np.int32)
        zeros = rng.integers(0, 1 << bits, (din // gs, dout), dtype=np.uint32)
        zp = np.zeros((din // gs, dout // per), np.uint32)
        for j in range(per):
            zp |= zeros[:, j::per] << (bits * j)
        t[name + ".qzeros"] = zp.view(np.int32)
        t[name + ".scales"] = rng.uniform(0.001, 0.02, (din // gs, dout)).astype(np.float16)
        t[name + ".g_idx"] = (np.arange(din) // gs).astype(np.int32)
        return codes, zeros, t[name + ".scales"]

    t["model.embed_tokens.weight"] = rng.normal(0, 0.02, (V, D)).astype(np.float32)
    t["model.norm.weight"] = np.ones((D,), np.float32)
    if not cfg.tie_word_embeddings:
        dense("lm_head", V, D)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones((D,), np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones((D,), np.float32)
        mk = (lambda n, o, d: gptq(p + n, o, d, quantized)) if quantized \
            else (lambda n, o, d: dense(p + n, o, d))
        mk("self_attn.q_proj", H * hd, D)
        mk("self_attn.k_proj", Hkv * hd, D)
        mk("self_attn.v_proj", Hkv * hd, D)
        mk("self_attn.o_proj", D, H * hd)
        mk("mlp.gate_proj", F, D)
        mk("mlp.up_proj", F, D)
        mk("mlp.down_proj", D, F)
        if cfg.attention_bias:
            t[p + "self_attn.q_proj.bias"] = rng.normal(0, 0.01, (H * hd,)).astype(np.float32)
            t[p + "self_attn.k_proj.bias"] = rng.normal(0, 0.01, (Hkv * hd,)).astype(np.float32)
            t[p + "self_attn.v_proj.bias"] = rng.normal(0, 0.01, (Hkv * hd,)).astype(np.float32)
    stnp.save_file(t, os.path.join(tmp_path, "model.safetensors"))
    cfgj = dict(vocab_size=V, hidden_size=D, intermediate_size=F,
                num_hidden_layers=cfg.num_layers, num_attention_heads=H,
                num_key_value_heads=Hkv, rope_theta=cfg.rope_theta,
                rms_norm_eps=cfg.rms_norm_eps, model_type="qwen2",
                tie_word_embeddings=cfg.tie_word_embeddings,
                eos_token_id=cfg.eos_token_id)
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(cfgj, f)
    return t


def test_unpack_roundtrip():
    rng = np.random.default_rng(1)
    for bits in (4, 8):
        per = 32 // bits
        codes = rng.integers(0, 1 << bits, (256, 64), dtype=np.uint32)
        packed = np.zeros((256 // per, 64), np.uint32)
        for j in range(per):
            packed |= codes[j::per] << (bits * j)
        out = _unpack_gptq_int32(packed.view(np.int32), bits)
        np.testing.assert_array_equal(out, codes.astype(np.uint8))


def test_dense_checkpoint_forward(tmp_path):
    cfg = ModelConfig.tiny(vocab_size=128, num_layers=2)
    _write_synthetic_ckpt(str(tmp_path), cfg)
    cfg2, params = load_hf(str(tmp_path), cfg)
    toks = (jnp.arange(6, dtype=jnp.int32) % 100)[None, :]
    cache = init_cache(cfg, 1, 8)
    logits, _ = transformer.forward(cfg, params, toks, cache)
    assert logits.shape == (1, 6, 128)
    assert not bool(jnp.isnan(logits).any())


def test_config_from_hf(tmp_path):
    cfg = ModelConfig.tiny(vocab_size=128)
    _write_synthetic_ckpt(str(tmp_path), cfg)
    c = config_from_hf(str(tmp_path))
    assert c.vocab_size == 128 and c.num_layers == cfg.num_layers
    assert c.attention_bias


@pytest.mark.parametrize("bits", [8, 4])
def test_gptq_checkpoint_dequant_matches_autogptq(tmp_path, bits):
    """auto-gptq semantics: w = scale[g] * (code - (qzero[g]+1)). Our loader
    shifts to signed codes; dequantize() must reproduce the same matrix."""
    cfg = ModelConfig.tiny(vocab_size=128, hidden_size=256,
                           intermediate_size=256, num_layers=1, num_heads=4,
                           num_kv_heads=4, head_dim=64)
    t = _write_synthetic_ckpt(str(tmp_path), cfg, quantized=bits)
    from hsd_tpu.models.loader import _load_all_tensors
    tt = _load_all_tensors(str(tmp_path))
    prefix = "model.layers.0.mlp.gate_proj"
    ql = _gptq_linear(tt, prefix, bits, jnp.float32)
    got = np.asarray(dequantize(ql, jnp.float32))
    codes = _unpack_gptq_int32(tt[prefix + ".qweight"], bits).astype(np.float32)
    zeros = _unpack_gptq_int32(tt[prefix + ".qzeros"].T, bits).T.astype(np.float32)
    scales = tt[prefix + ".scales"].astype(np.float32)
    din = codes.shape[0]
    gs = din // scales.shape[0]
    g = np.arange(din) // gs
    want = scales[g] * (codes - (zeros[g] + 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gptq_checkpoint_loads_stacked(tmp_path):
    cfg = ModelConfig.tiny(vocab_size=128, hidden_size=256,
                           intermediate_size=384, num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=64)
    _write_synthetic_ckpt(str(tmp_path), cfg, quantized=8)
    cfg2, params = load_hf(str(tmp_path), cfg, quantized=8)
    assert params.layers["wq"].qweight.shape == (2, 256, 256)
    toks = (jnp.arange(4, dtype=jnp.int32) % 100)[None, :]
    cache = init_cache(cfg, 1, 8)
    logits, _ = transformer.forward(cfg, params, toks, cache)
    assert not bool(jnp.isnan(logits).any())


def test_quantized_embedding_forward():
    """QuantizedEmbedding (per-row int8) matches the dense embedding closely
    and runs through the full forward with an untied quantized head."""
    import dataclasses
    from hsd_tpu.models.transformer import (QuantizedEmbedding,
                                            quantize_embedding)
    from hsd_tpu.models import init_params
    from hsd_tpu.ops.linear import quantize

    cfg = dataclasses.replace(ModelConfig.tiny(vocab_size=128, hidden_size=256,
                                               intermediate_size=256,
                                               num_layers=2, num_heads=4,
                                               num_kv_heads=4, head_dim=64),
                              tie_word_embeddings=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qe = quantize_embedding(params.embed)
    # roundtrip error bounded by the per-row step
    dq = qe.codes.astype(jnp.float32) * qe.scale[:, None]
    err = jnp.abs(dq - params.embed.astype(jnp.float32)).max() / \
        jnp.abs(params.embed.astype(jnp.float32)).max()
    assert float(err) < 0.02
    qparams = params._replace(embed=qe,
                              lm_head=quantize(params.lm_head.astype(jnp.float32)))
    toks = (jnp.arange(6, dtype=jnp.int32) % 100)[None, :]
    l1, _ = transformer.forward(cfg, params, toks, init_cache(cfg, 1, 8))
    l2, _ = transformer.forward(cfg, qparams, toks, init_cache(cfg, 1, 8))
    # quantization noise only
    c1 = np.asarray(jnp.argmax(l1, -1))
    c2 = np.asarray(jnp.argmax(l2, -1))
    assert (c1 == c2).mean() > 0.5  # loose: same model up to int8 noise
    assert not bool(jnp.isnan(l2).any())


def test_align_vocab_truncates_both_models():
    """align_vocab: mismatched Qwen-style vocab widths truncate to the common
    min (ref: eval_speculative_decoding_llm.py:140-198) with exact logit
    equality on the surviving rows, for dense-tied, dense-untied and
    quantized heads."""
    import dataclasses
    from hsd_tpu.models import init_params
    from hsd_tpu.models.loader import align_vocab
    from hsd_tpu.ops.linear import quantize

    cfg_d = ModelConfig.tiny(vocab_size=64)                      # tied head
    cfg_t = dataclasses.replace(ModelConfig.tiny(vocab_size=96),
                                tie_word_embeddings=False,
                                eos_token_id=63)
    pd = init_params(cfg_d, jax.random.PRNGKey(0))
    pt = init_params(cfg_t, jax.random.PRNGKey(1))

    toks = (jnp.arange(5, dtype=jnp.int32) % 60)[None, :]
    base_t, _ = transformer.forward(cfg_t, pt, toks, init_cache(cfg_t, 1, 8))

    cfg_d2, pd2, cfg_t2, pt2 = align_vocab(cfg_d, pd, cfg_t, pt)
    assert cfg_d2.vocab_size == cfg_t2.vocab_size == 64
    assert pd2.embed.shape[0] == 64 and pt2.lm_head.shape == \
        (cfg_t.hidden_size, 64)
    out_t, _ = transformer.forward(cfg_t2, pt2, toks, init_cache(cfg_t2, 1, 8))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(base_t[..., :64]),
                               rtol=1e-5, atol=1e-5)

    # quantized untied head: codes/scales/zeros slice on the out axis
    ptq = pt._replace(lm_head=quantize(pt.lm_head.astype(jnp.float32),
                                       group_size=64))
    _, _, cfg_t3, pt3 = align_vocab(cfg_d, pd, cfg_t, ptq)
    assert pt3.lm_head.qweight.shape[-1] == 64
    outq, _ = transformer.forward(cfg_t3, pt3, toks, init_cache(cfg_t3, 1, 8))
    assert outq.shape[-1] == 64 and bool(jnp.isfinite(outq).all())

    # EOS beyond the truncated width must be rejected
    cfg_bad = dataclasses.replace(cfg_t, eos_token_id=90)
    with np.testing.assert_raises(AssertionError):
        align_vocab(cfg_d, pd, cfg_bad, pt)
