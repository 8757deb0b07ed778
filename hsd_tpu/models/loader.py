"""HF checkpoint loading: safetensors -> ModelParams pytrees.

Covers the model zoo the reference drives (SURVEY.md §2.2/2.3):
  * plain bf16/f16 Qwen2/Llama/Mixtral checkpoints;
  * GPTQ weight-only checkpoints (auto-gptq layout: packed int32 qweight,
    packed int32 qzeros, f16 scales, group_size typically 128) — the formats
    behind `Qwen/Qwen2.5-*-Instruct-GPTQ-Int8/Int4`
    (ref: eval_speculative_decoding_llm.py:37,63) — unpacked into our
    QuantizedLinear [in, out] int8-code layout at load time.

Loading is pure NumPy (host) then device_put with shardings, so a 72B target
streams straight into its TP shards without materializing on one chip.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.linear import QuantizedLinear
from .transformer import ModelParams


def _load_all_tensors(path: str) -> Dict[str, np.ndarray]:
    """Load every tensor of a checkpoint directory.

    Prefers `model.safetensors.index.json` (sharded checkpoints): loads
    exactly the files the weight_map names, each once, and verifies every
    mapped key landed — a truncated download fails loudly instead of
    producing a partial model. Falls back to globbing *.safetensors."""
    from safetensors import numpy as stnp

    tensors = {}
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for fname in sorted(set(weight_map.values())):
            fp = os.path.join(path, fname)
            if not os.path.exists(fp):
                raise FileNotFoundError(
                    f"index names {fname} but it is missing under {path}")
            tensors.update(stnp.load_file(fp))
        missing = [k for k in weight_map if k not in tensors]
        if missing:
            raise ValueError(f"index keys missing from shards: {missing[:5]}"
                             f"{'...' if len(missing) > 5 else ''}")
        return tensors
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    for f in files:
        tensors.update(stnp.load_file(f))
    return tensors


def read_quant_config(path: str) -> Optional[Dict]:
    """Read GPTQ quantization metadata from either of the two conventions:
    `quantization_config` inside config.json (HF transformers) or the
    standalone `quantize_config.json` (auto-gptq). Returns a normalized dict
    {bits, group_size, sym, desc_act, zero_offset} or None if unquantized.

    zero_offset encodes the checkpoint format's zero-point convention:
      * 1 — auto-gptq v1 (`checkpoint_format` absent or "gptq"):
            w = scale * (code - (qzero + 1)), the historical off-by-one;
      * 0 — "gptq_v2" (gptqmodel): w = scale * (code - qzero).
    """
    qc = None
    cfgp = os.path.join(path, "config.json")
    if os.path.exists(cfgp):
        with open(cfgp) as f:
            qc = json.load(f).get("quantization_config")
    if qc is None:
        qcp = os.path.join(path, "quantize_config.json")
        if os.path.exists(qcp):
            with open(qcp) as f:
                qc = json.load(f)
    if qc is None or qc.get("quant_method", "gptq") != "gptq":
        return None
    fmt = qc.get("checkpoint_format", "gptq")
    return {
        "bits": int(qc["bits"]),
        "group_size": int(qc.get("group_size", 128)),
        "sym": bool(qc.get("sym", True)),
        "desc_act": bool(qc.get("desc_act", False)),
        "zero_offset": 0 if fmt == "gptq_v2" else 1,
    }


def config_from_hf(path: str) -> ModelConfig:
    """Build a ModelConfig from an HF config.json (Qwen2/Llama/Mixtral families)."""
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    eos = c.get("eos_token_id")
    if isinstance(eos, list):
        eos = eos[0]
    rs = c.get("rope_scaling")
    rope_scaling = None
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        rope_scaling = (float(rs["factor"]),
                        float(rs["low_freq_factor"]),
                        float(rs["high_freq_factor"]),
                        int(rs["original_max_position_embeddings"]))
    return ModelConfig(
        rope_scaling=rope_scaling,
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        num_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
        head_dim=c.get("head_dim"),
        rope_theta=c.get("rope_theta", 10000.0),
        rms_norm_eps=c.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=c.get("tie_word_embeddings", False),
        attention_bias=c.get("model_type", "qwen2") == "qwen2",
        eos_token_id=eos if eos is not None else 0,
        # Mixtral family (ref: modeling_mixtral_kv.py:465-466 reads
        # num_local_experts / num_experts_per_tok off the HF config)
        num_experts=c.get("num_local_experts", 0),
        num_experts_per_tok=c.get("num_experts_per_tok", 2),
    )


def _unpack_gptq_int32(packed: np.ndarray, bits: int) -> np.ndarray:
    """Unpack auto-gptq int32 rows into unsigned codes along axis 0.

    packed: [in*bits/32, out] -> codes [in, out] uint8 (values in [0, 2^bits)).
    """
    per = 32 // bits
    mask = (1 << bits) - 1
    out = np.empty((packed.shape[0] * per, packed.shape[1]), np.uint8)
    p = packed.view(np.uint32)
    for j in range(per):
        out[j::per] = (p >> (bits * j)) & mask
    return out


def _gptq_linear(t: Dict[str, np.ndarray], prefix: str, bits: int,
                 dtype, zero_offset: int = 1) -> QuantizedLinear:
    """Convert one auto-gptq layer to QuantizedLinear ([in, out] int8 codes).

    auto-gptq v1 dequant: w = scale[g] * (code - (qzero[g] + 1)) (the
    historical off-by-one); gptq_v2 drops the +1 (zero_offset=0). Our
    contract is w = (code' - zero) * scale with signed code'; we shift codes
    to signed by subtracting 2^(bits-1) and fold the shift into zero.

    desc_act (act-order) checkpoints carry a permuted g_idx: row i belongs to
    group g_idx[i] instead of i // group_size. Rows are re-sorted here by
    stable argsort(g_idx) so groups become contiguous, and the sort is kept
    in QuantizedLinear.perm — apply_linear gathers the activations to match
    (ops/linear.py). Symmetric checkpoints without qzeros get zeros=None.
    """
    qweight = _unpack_gptq_int32(t[prefix + ".qweight"], bits)     # [in, out]
    scales = t[prefix + ".scales"].astype(np.float32)              # [groups, out]
    g_idx = t.get(prefix + ".g_idx")
    groups = scales.shape[0]
    din = qweight.shape[0]
    gs = din // groups
    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx, np.int64)
        expect = np.arange(din) // gs
        if not np.array_equal(g_idx, expect):
            counts = np.bincount(g_idx, minlength=groups)
            if not (counts == gs).all():
                raise NotImplementedError(
                    f"ragged g_idx groups (sizes {sorted(set(counts))}) "
                    f"not supported")
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            qweight = qweight[perm]
    offset = 1 << (bits - 1)
    codes = qweight.astype(np.int16) - offset
    qz = t.get(prefix + ".qzeros")
    if qz is not None:
        qzeros = _unpack_gptq_int32(qz.T, bits).T                  # [groups, out]
        zeros = (qzeros.astype(np.float32) + zero_offset) - offset
    else:
        zeros = None  # symmetric: w = scale * code'
    if bits == 4 and din % 2 == 0:
        # keep 4-bit checkpoints nibble-packed (uint8 marker dtype):
        # SPLIT-HALF pairing (row i | row i+din/2 — ops/linear.py pack_int4
        # convention), nibbles stored unsigned (= raw GPTQ codes; the -8
        # shift rides in the kernel's zero correction) — halves the decode
        # weight stream and keeps the kernel's activation planes contiguous
        c = qweight.astype(np.int32)               # unsigned 0..15 codes
        half = din // 2
        q = (((c[half:] & 0xF) << 4) | (c[:half] & 0xF)).astype(np.uint8)
    else:
        q = codes.astype(np.int8)
    return QuantizedLinear(
        qweight=jnp.asarray(q),
        scales=jnp.asarray(scales),
        zeros=None if zeros is None else jnp.asarray(zeros.astype(np.float32)),
        perm=None if perm is None else jnp.asarray(perm),
    )


def _dense(t: Dict[str, np.ndarray], name: str, dtype,
           transpose: bool = True) -> jnp.ndarray:
    w = t[name]
    if transpose and w.ndim == 2:
        w = w.T  # HF stores [out, in]; we use [in, out]
    return jnp.asarray(w.astype(np.float32)).astype(dtype)


def load_hf(path: str, cfg: Optional[ModelConfig] = None,
            quantized: Optional[int] = None,
            quantize_embed: bool = False) -> tuple:
    """Load an HF Qwen2/Llama/Mixtral checkpoint directory.

    quantized: None to auto-detect from the checkpoint's quantization config
      (config.json `quantization_config` / quantize_config.json — covers
      bits, desc_act and the v1/v2 zero convention); 8/4 to force GPTQ bits
      on configless checkpoints.
    quantize_embed: also quantize the embedding table per-row int8
      (requires an untied head; halves the table's HBM footprint).
    Returns (cfg, ModelParams) with layer weights stacked on axis 0.
    """
    cfg = cfg or config_from_hf(path)
    t = _load_all_tensors(path)
    L = cfg.num_layers
    dt = cfg.dtype
    qc = read_quant_config(path)
    zero_offset = 1
    if qc is not None:
        if quantized is None:
            quantized = qc["bits"]
        zero_offset = qc["zero_offset"]

    def stack_dense(fmt):
        return jnp.stack([_dense(t, fmt.format(i), dt) for i in range(L)])

    def stack_bias(fmt):
        return jnp.stack([jnp.asarray(t[fmt.format(i)].astype(np.float32))
                          for i in range(L)]).astype(dt)

    def _stack_q(qs):
        if any(q.perm is not None for q in qs):
            # desc_act may leave some layers already-contiguous (identity)
            ident = jnp.arange(qs[0].din, dtype=jnp.int32)
            qs = [q if q.perm is not None else q._replace(perm=ident)
                  for q in qs]
        return QuantizedLinear(
            qweight=jnp.stack([q.qweight for q in qs]),
            scales=jnp.stack([q.scales for q in qs]),
            zeros=(None if qs[0].zeros is None
                   else jnp.stack([q.zeros for q in qs])),
            perm=(None if qs[0].perm is None
                  else jnp.stack([q.perm for q in qs])),
        )

    def stack_gptq(fmt):
        return _stack_q([_gptq_linear(t, fmt.format(i), quantized, dt,
                                      zero_offset) for i in range(L)])

    pre = "model.layers.{}."
    if quantized:
        mat = lambda name: stack_gptq(pre + name)
    else:
        mat = lambda name: stack_dense(pre + name + ".weight")

    layers = dict(
        ln1=jnp.stack([jnp.asarray(
            t[f"model.layers.{i}.input_layernorm.weight"].astype(np.float32))
            for i in range(L)]),
        ln2=jnp.stack([jnp.asarray(
            t[f"model.layers.{i}.post_attention_layernorm.weight"].astype(np.float32))
            for i in range(L)]),
        wq=mat("self_attn.q_proj"),
        wk=mat("self_attn.k_proj"),
        wv=mat("self_attn.v_proj"),
        wo=mat("self_attn.o_proj"),
    )
    if cfg.is_moe:
        # Mixtral layout: block_sparse_moe.gate + experts.{e}.w1/w3/w2
        # (ref: modeling_mixtral_kv.py:432-434,469-471; w1=gate, w3=up,
        # w2=down). Stacked [L, E, in, out].
        E = cfg.num_experts

        def stack_experts(wname):
            if quantized:
                rows = [_stack_q([_gptq_linear(
                    t, f"model.layers.{i}.block_sparse_moe.experts.{e}.{wname}",
                    quantized, dt, zero_offset) for e in range(E)])
                    for i in range(L)]
                return QuantizedLinear(
                    qweight=jnp.stack([r.qweight for r in rows]),
                    scales=jnp.stack([r.scales for r in rows]),
                    zeros=(None if rows[0].zeros is None
                           else jnp.stack([r.zeros for r in rows])),
                    perm=(None if rows[0].perm is None
                          else jnp.stack([r.perm for r in rows])),
                )
            return jnp.stack([jnp.stack([_dense(
                t, f"model.layers.{i}.block_sparse_moe.experts.{e}.{wname}.weight",
                dt) for e in range(E)]) for i in range(L)])

        layers.update(
            gate=jnp.stack([_dense(
                t, f"model.layers.{i}.block_sparse_moe.gate.weight",
                jnp.float32) for i in range(L)]),
            wgate=stack_experts("w1"),
            wup=stack_experts("w3"),
            wdown=stack_experts("w2"),
        )
    else:
        layers.update(
            wgate=mat("mlp.gate_proj"),
            wup=mat("mlp.up_proj"),
            wdown=mat("mlp.down_proj"),
        )
    if cfg.attention_bias and "model.layers.0.self_attn.q_proj.bias" in t:
        layers.update(
            bq=stack_bias("model.layers.{}.self_attn.q_proj.bias"),
            bk=stack_bias("model.layers.{}.self_attn.k_proj.bias"),
            bv=stack_bias("model.layers.{}.self_attn.v_proj.bias"),
        )

    embed = _dense(t, "model.embed_tokens.weight", dt, transpose=False)
    lm_head = None
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in t:
            lm_head = _dense(t, "lm_head.weight", dt)  # -> [D, V]
        else:
            # some Llama-3 exports declare tie_word_embeddings=false but
            # still omit lm_head.weight (tied in practice): fall back to the
            # embedding table rather than crash mid-72B-load
            import dataclasses as _dc
            cfg = _dc.replace(cfg, tie_word_embeddings=True)
    # (config tied + materialized lm_head.weight in the export: ignore the
    # duplicate and keep the single-copy tied representation)
    if quantize_embed:
        if cfg.tie_word_embeddings:
            raise ValueError("quantize_embed requires an untied lm_head")
        from .transformer import quantize_embedding
        embed = quantize_embedding(embed)
    final_norm = jnp.asarray(t["model.norm.weight"].astype(np.float32))
    return cfg, ModelParams(embed=embed, layers=layers,
                            final_norm=final_norm, lm_head=lm_head)


def _truncate_vocab(cfg: ModelConfig, params: ModelParams, V: int):
    """Slice one model's vocab-sized tensors down to V rows/columns."""
    import dataclasses

    from .transformer import QuantizedEmbedding

    if cfg.vocab_size == V:
        return cfg, params
    assert cfg.vocab_size > V, (cfg.vocab_size, V)
    embed = params.embed
    if isinstance(embed, QuantizedEmbedding):
        embed = QuantizedEmbedding(codes=embed.codes[:V],
                                   scale=embed.scale[:V])
    else:
        embed = embed[:V]
    lm_head = params.lm_head
    if isinstance(lm_head, QuantizedLinear):
        lm_head = QuantizedLinear(
            qweight=lm_head.qweight[..., :V],
            scales=lm_head.scales[..., :V],
            zeros=None if lm_head.zeros is None else lm_head.zeros[..., :V])
    elif lm_head is not None:
        lm_head = lm_head[:, :V]
    eos = cfg.eos_token_id
    assert eos < V, f"eos_token_id {eos} would be truncated (V={V})"
    return (dataclasses.replace(cfg, vocab_size=V),
            params._replace(embed=embed, lm_head=lm_head))


def align_vocab(cfg_a: ModelConfig, params_a: ModelParams,
                cfg_b: ModelConfig, params_b: ModelParams):
    """Truncate both models' vocabularies to the common minimum.

    Speculative verification compares full q/p logit rows, so draft and
    target must emit the same vocab width; Qwen2.5 pairs differ (0.5B:
    151936 vs 14B+: 152064). The reference rebuilds each model's lm_head at
    min-vocab width (eval_speculative_decoding_llm.py:140-198); here the
    embed rows and lm_head out-features are sliced instead (works for dense,
    tied, QuantizedLinear and QuantizedEmbedding heads). The dropped rows are
    beyond the tokenizer's id range for these checkpoints, so the sampled
    distribution is unchanged up to softmax renormalization over the removed
    (untrained) tail — the same semantics as the reference.

    Returns (cfg_a', params_a', cfg_b', params_b').
    """
    V = min(cfg_a.vocab_size, cfg_b.vocab_size)
    cfg_a, params_a = _truncate_vocab(cfg_a, params_a, V)
    cfg_b, params_b = _truncate_vocab(cfg_b, params_b, V)
    return cfg_a, params_a, cfg_b, params_b


def load_eagle_hf(path: str, target_embed, dtype=jnp.bfloat16):
    """Load an EAGLE-3 draft-head checkpoint (e.g. EAGLE3-LLaMA3.1-Instruct-8B)
    into EagleParams. The head checkpoint stores the fused decoder layer under
    `midlayer.*` plus `fc/norm/lm_head/d2t/t2d` (ref: cnets.py:487-541);
    embeddings are the frozen target's (`target_embed`).
    """
    from .eagle import EagleParams

    t = _load_all_tensors(path)

    def g(name, transpose=True):
        w = t[name]
        if transpose and w.ndim == 2:
            w = w.T
        return jnp.asarray(w.astype(np.float32)).astype(dtype)

    def norm(name):
        return jnp.asarray(t[name].astype(np.float32))

    vd = t["lm_head.weight"].shape[0]
    d2t = t.get("d2t")
    t2d = t.get("t2d")
    V = target_embed.shape[0]
    return EagleParams(
        embed=target_embed.astype(dtype),
        fc=g("fc.weight"),
        ln_input=norm("midlayer.input_layernorm.weight"),
        ln_hidden=norm("midlayer.hidden_norm.weight"),
        wq=g("midlayer.self_attn.q_proj.weight"),
        wk=g("midlayer.self_attn.k_proj.weight"),
        wv=g("midlayer.self_attn.v_proj.weight"),
        wo=g("midlayer.self_attn.o_proj.weight"),
        ln_post=norm("midlayer.post_attention_layernorm.weight"),
        wgate=g("midlayer.mlp.gate_proj.weight"),
        wup=g("midlayer.mlp.up_proj.weight"),
        wdown=g("midlayer.mlp.down_proj.weight"),
        norm=norm("norm.weight"),
        lm_head=g("lm_head.weight"),
        d2t=(jnp.asarray(d2t.astype(np.int64)).astype(jnp.int32)
             if d2t is not None else jnp.zeros((vd,), jnp.int32)),
        t2d=(jnp.asarray(t2d.astype(bool))
             if t2d is not None else jnp.ones((V,), bool)),
    )
