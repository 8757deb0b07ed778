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


# ---------------------------------------------------------------------------
# Real-world GPTQ/HF checkpoint variants (auto-gptq packing replicated
# bit-exactly per convention; VERDICT round-1 hardening items)
# ---------------------------------------------------------------------------

def _write_gptq_layer(t, name, dout, din, bits, rng, gs=128, desc_act=False,
                      sym=False, store_qzeros=True):
    """Replicate auto-gptq packing for one layer, optionally with a permuted
    act-order g_idx (desc_act=True) whose groups stay exactly gs-sized."""
    per = 32 // bits
    codes = rng.integers(0, 1 << bits, (din, dout), dtype=np.uint32)
    packed = np.zeros((din // per, dout), np.uint32)
    for j in range(per):
        packed |= codes[j::per] << (bits * j)
    t[name + ".qweight"] = packed.view(np.int32)
    groups = din // gs
    if desc_act:
        g_idx = rng.permutation(np.repeat(np.arange(groups), gs))
    else:
        g_idx = np.arange(din) // gs
    t[name + ".g_idx"] = g_idx.astype(np.int32)
    if store_qzeros:
        if sym:
            zeros = np.full((groups, dout), (1 << (bits - 1)) - 1, np.uint32)
        else:
            zeros = rng.integers(0, 1 << bits, (groups, dout), dtype=np.uint32)
        zp = np.zeros((groups, dout // per), np.uint32)
        for j in range(per):
            zp |= zeros[:, j::per] << (bits * j)
        t[name + ".qzeros"] = zp.view(np.int32)
    t[name + ".scales"] = rng.uniform(0.001, 0.02,
                                      (groups, dout)).astype(np.float16)
    return codes, g_idx


def _ref_dequant(t, name, bits, zero_offset=1):
    """Reference (numpy float64) GPTQ dequantization honoring g_idx and the
    v1/v2 zero convention."""
    codes = _unpack_gptq_int32(t[name + ".qweight"], bits).astype(np.float64)
    scales = t[name + ".scales"].astype(np.float64)
    g_idx = np.asarray(t[name + ".g_idx"], np.int64)
    if name + ".qzeros" in t:
        zeros = _unpack_gptq_int32(
            t[name + ".qzeros"].T, bits).T.astype(np.float64)
        z = zeros[g_idx] + zero_offset
    else:
        z = float(1 << (bits - 1))
    return scales[g_idx] * (codes - z)


@pytest.mark.parametrize("bits", [8, 4])
def test_desc_act_dequant_matches_reference(bits):
    """desc_act (permuted g_idx): dequantize() must return the ORIGINAL-order
    weight matrix, bit-exact vs the numpy reference."""
    rng = np.random.default_rng(7)
    t = {}
    _write_gptq_layer(t, "x", 64, 256, bits, rng, desc_act=True)
    ql = _gptq_linear(t, "x", bits, jnp.float32)
    assert ql.perm is not None
    got = np.asarray(dequantize(ql, jnp.float32))
    want = _ref_dequant(t, "x", bits)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bits", [8, 4])
def test_desc_act_apply_linear_matches_dense(bits):
    """apply_linear with a perm == x @ dequantized-original-order weight, on
    the XLA path (both the small-N grouped form and the large-N dequant
    form)."""
    from hsd_tpu.ops.linear import apply_linear
    rng = np.random.default_rng(8)
    t = {}
    _write_gptq_layer(t, "x", 64, 256, bits, rng, desc_act=True)
    ql = _gptq_linear(t, "x", bits, jnp.float32)
    w = _ref_dequant(t, "x", bits).astype(np.float32)
    for n in (2, 80):   # decode-regime grouped path and large-N dequant path
        x = rng.normal(0, 1, (n, 256)).astype(np.float32)
        got = np.asarray(apply_linear(ql, jnp.asarray(x)))
        np.testing.assert_allclose(got, x @ w, rtol=2e-3, atol=2e-3)


def test_desc_act_stacked_layer_forward(tmp_path):
    """A full desc_act checkpoint loads (stacked per-layer perms) and
    decodes finitely end-to-end."""
    import json as _json
    from safetensors import numpy as stnp
    cfg = ModelConfig.tiny(vocab_size=128, hidden_size=256,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=4, head_dim=64)
    rng = np.random.default_rng(9)
    t = {"model.embed_tokens.weight":
         rng.normal(0, 0.02, (128, 256)).astype(np.float32),
         "model.norm.weight": np.ones((256,), np.float32)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones((256,), np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones((256,), np.float32)
        for nm, o, d in (("self_attn.q_proj", 256, 256),
                         ("self_attn.k_proj", 256, 256),
                         ("self_attn.v_proj", 256, 256),
                         ("self_attn.o_proj", 256, 256),
                         ("mlp.gate_proj", 256, 256),
                         ("mlp.up_proj", 256, 256),
                         ("mlp.down_proj", 256, 256)):
            # first layer permuted, second contiguous: exercises the
            # identity-fill in _stack_q
            _write_gptq_layer(t, p + nm, o, d, 8, rng, desc_act=(i == 0))
    stnp.save_file(t, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        _json.dump(dict(vocab_size=128, hidden_size=256,
                        intermediate_size=256, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=4,
                        head_dim=64, model_type="llama", rope_theta=1e4,
                        tie_word_embeddings=True, eos_token_id=0,
                        quantization_config=dict(quant_method="gptq", bits=8,
                                                 group_size=128, sym=False,
                                                 desc_act=True)), f)
    cfg2, params = load_hf(str(tmp_path), cfg)   # bits auto-detected
    assert params.layers["wq"].perm is not None
    assert params.layers["wq"].perm.shape == (2, 256)
    toks = (jnp.arange(5, dtype=jnp.int32) % 100)[None, :]
    logits, _ = transformer.forward(cfg, params, toks, init_cache(cfg, 1, 8))
    assert bool(jnp.isfinite(logits).all())
    # layer 0 must reproduce the reference dequant through the stacked path
    from hsd_tpu.ops.linear import apply_linear
    x = rng.normal(0, 1, (1, 256)).astype(np.float32)
    got = np.asarray(apply_linear(params.layers["wq"], jnp.asarray(x),
                                  layer=jnp.int32(0)))
    want = x @ _ref_dequant(t, "model.layers.0.self_attn.q_proj", 8
                            ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_gptq_v2_zero_convention():
    """checkpoint_format=gptq_v2 drops the historical +1: w = s*(c - qz)."""
    rng = np.random.default_rng(10)
    t = {}
    _write_gptq_layer(t, "x", 64, 256, 8, rng)
    ql1 = _gptq_linear(t, "x", 8, jnp.float32, zero_offset=1)
    ql2 = _gptq_linear(t, "x", 8, jnp.float32, zero_offset=0)
    w1 = np.asarray(dequantize(ql1, jnp.float32))
    w2 = np.asarray(dequantize(ql2, jnp.float32))
    np.testing.assert_allclose(w1, _ref_dequant(t, "x", 8, 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w2, _ref_dequant(t, "x", 8, 0),
                               rtol=1e-5, atol=1e-5)
    # the two differ by exactly one scale step everywhere
    np.testing.assert_allclose(w2 - w1,
                               t["x.scales"].astype(np.float64)[
                                   np.asarray(t["x.g_idx"], np.int64)],
                               rtol=1e-5, atol=1e-6)


def test_symmetric_no_qzeros():
    """A symmetric export without qzeros tensors: zeros=None, centered at
    2^(b-1)."""
    rng = np.random.default_rng(11)
    t = {}
    _write_gptq_layer(t, "x", 64, 256, 8, rng, store_qzeros=False)
    ql = _gptq_linear(t, "x", 8, jnp.float32)
    assert ql.zeros is None
    got = np.asarray(dequantize(ql, jnp.float32))
    np.testing.assert_allclose(got, _ref_dequant(t, "x", 8),
                               rtol=1e-5, atol=1e-5)


def test_read_quant_config(tmp_path):
    import json as _json
    from hsd_tpu.models.loader import read_quant_config
    assert read_quant_config(str(tmp_path)) is None
    with open(tmp_path / "config.json", "w") as f:
        _json.dump({"quantization_config": {
            "quant_method": "gptq", "bits": 4, "group_size": 64,
            "sym": True, "desc_act": True,
            "checkpoint_format": "gptq_v2"}}, f)
    qc = read_quant_config(str(tmp_path))
    assert qc == {"bits": 4, "group_size": 64, "sym": True,
                  "desc_act": True, "zero_offset": 0}
    # standalone auto-gptq quantize_config.json (v1 default offset)
    os.unlink(tmp_path / "config.json")
    with open(tmp_path / "quantize_config.json", "w") as f:
        _json.dump({"bits": 8, "group_size": 128, "desc_act": False}, f)
    qc = read_quant_config(str(tmp_path))
    assert qc["bits"] == 8 and qc["zero_offset"] == 1


def test_sharded_index_loading(tmp_path):
    """model.safetensors.index.json: loads exactly the mapped shards and
    fails loudly on a missing one."""
    import json as _json
    from safetensors import numpy as stnp
    from hsd_tpu.models.loader import _load_all_tensors
    a = {"w.a": np.ones((2, 2), np.float32)}
    b = {"w.b": np.zeros((3,), np.float32)}
    stnp.save_file(a, str(tmp_path / "model-00001-of-00002.safetensors"))
    stnp.save_file(b, str(tmp_path / "model-00002-of-00002.safetensors"))
    # an EXTRA stray file that the index does not name must be ignored
    stnp.save_file({"stray": np.ones((1,), np.float32)},
                   str(tmp_path / "extra.safetensors"))
    idx = {"weight_map": {"w.a": "model-00001-of-00002.safetensors",
                          "w.b": "model-00002-of-00002.safetensors"}}
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        _json.dump(idx, f)
    t = _load_all_tensors(str(tmp_path))
    assert set(t) == {"w.a", "w.b"}
    os.unlink(tmp_path / "model-00002-of-00002.safetensors")
    with pytest.raises(FileNotFoundError):
        _load_all_tensors(str(tmp_path))


def test_untied_config_missing_lm_head_falls_back_tied(tmp_path):
    import dataclasses
    cfg = dataclasses.replace(ModelConfig.tiny(vocab_size=128, num_layers=2),
                              tie_word_embeddings=False)
    # writer only emits lm_head when cfg says untied; write a TIED checkpoint
    # then load with the untied config
    _write_synthetic_ckpt(str(tmp_path),
                          dataclasses.replace(cfg, tie_word_embeddings=True))
    cfg2, params = load_hf(str(tmp_path), cfg)
    assert cfg2.tie_word_embeddings and params.lm_head is None
    toks = (jnp.arange(4, dtype=jnp.int32) % 100)[None, :]
    logits, _ = transformer.forward(cfg2, params, toks, init_cache(cfg2, 1, 8))
    assert logits.shape[-1] == 128 and bool(jnp.isfinite(logits).all())


def test_rope_scaling_llama3(tmp_path):
    """config_from_hf parses rope_type=llama3 and _rope applies the HF
    piecewise frequency map (long wavelengths /factor, short kept, smooth
    ramp between)."""
    import json as _json
    from hsd_tpu.models.transformer import _rope
    cfgj = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=1, num_attention_heads=2,
                num_key_value_heads=2, model_type="llama",
                rope_theta=500000.0, tie_word_embeddings=True,
                eos_token_id=0,
                rope_scaling=dict(rope_type="llama3", factor=8.0,
                                  low_freq_factor=1.0, high_freq_factor=4.0,
                                  original_max_position_embeddings=8192))
    with open(tmp_path / "config.json", "w") as f:
        _json.dump(cfgj, f)
    c = config_from_hf(str(tmp_path))
    assert c.rope_scaling == (8.0, 1.0, 4.0, 8192)

    # hand-computed piecewise reference on raw frequencies
    d, theta = 32, 500000.0
    freqs = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    factor, lo_f, hi_f, orig = c.rope_scaling
    want = np.empty_like(freqs)
    for i, fr in enumerate(freqs):
        wl = 2 * np.pi / fr
        if wl < orig / hi_f:
            want[i] = fr
        elif wl > orig / lo_f:
            want[i] = fr / factor
        else:
            sm = (orig / wl - lo_f) / (hi_f - lo_f)
            want[i] = (1 - sm) * fr / factor + sm * fr
    # extract effective freqs from _rope by rotating a unit vector at pos=1
    x = np.zeros((1, 1, 1, d), np.float32)
    x[..., :d // 2] = 1.0
    pos = np.ones((1, 1), np.int32)
    out = np.asarray(_rope(jnp.asarray(x), jnp.asarray(pos), theta,
                           c.rope_scaling))[0, 0, 0]
    got_cos = out[:d // 2]
    np.testing.assert_allclose(got_cos, np.cos(want), rtol=1e-5, atol=1e-6)
    # scaled rope must differ from unscaled at the low-frequency tail once
    # positions are deep enough for the slowed wavelengths to matter
    pos_far = np.full((1, 1), 4096, np.int32)
    far = np.asarray(_rope(jnp.asarray(x), jnp.asarray(pos_far), theta,
                           c.rope_scaling))[0, 0, 0]
    far0 = np.asarray(_rope(jnp.asarray(x), jnp.asarray(pos_far),
                            theta))[0, 0, 0]
    assert np.abs(far - far0).max() > 0.1
