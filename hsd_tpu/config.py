"""Unified typed configuration for models, verification, quantization and mesh.

The reference scatters configuration over argparse CLIs, HF GenerationConfig
kwargs and ad-hoc flags (SURVEY.md §5 "Config / flag system"); here a single
set of dataclasses covers the whole engine.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Decoder-only transformer config covering Qwen2/2.5, Llama-2/3 and Mixtral families.

    Mirrors the fields of HF Qwen2Config/LlamaConfig that the reference models
    rely on (ref: EAGLE-3H/eagle/model/modeling_llama_kv.py,
    modeling_qwen2_kv.py), expressed once for the unified model stack.
    """

    vocab_size: int = 151936
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: Optional[int] = None  # defaults to hidden_size // num_heads
    rope_theta: float = 1000000.0
    # Llama-3.1+ frequency-dependent RoPE scaling, as the hashable tuple
    # (factor, low_freq_factor, high_freq_factor,
    #  original_max_position_embeddings); None = plain RoPE
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    attention_bias: bool = True  # Qwen2 uses qkv bias; Llama does not
    mlp_bias: bool = False
    max_position_embeddings: int = 32768
    dtype: jnp.dtype = jnp.bfloat16
    # EOS handling lives with the model family
    eos_token_id: int = 151645
    # Sparse mixture-of-experts (Mixtral family; ref vendors a tree-attention
    # Mixtral at EAGLE-3H/eagle/model/modeling_mixtral_kv.py:426-516).
    # num_experts == 0 means a dense MLP.
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # quantized-matmul execution path: 'auto' (Pallas on TPU in the decode
    # regime) | 'pallas' | 'xla'. Set 'xla' for TENSOR-PARALLEL quantized
    # targets: GSPMD cannot partition the Pallas custom call, so a sharded
    # qweight would be force-replicated (docs/MULTIHOST.md).
    gptq_path: str = "auto"
    # feed the quantized kernels' MXU bf16 operands (f32 accumulation).
    # OFF by default: the batch-1 decode matvec is weight-stream-bound and
    # keeps exact f32 numerics (every parity test pins them). Turn ON for
    # slot-BATCHED serving (engine/eagle_server) where the tree/verify
    # forward is f32-MXU COMPUTE-bound (measured 95 ms for the B=4 tree
    # forward at 8B geometry against a ~10 ms weight stream,
    # scripts/profile_eagle_pool.py). int8 /
    # int4 codes are bf16-exact; only activation rounding changes, which
    # moves acceptance rates (never correctness — verification reconstructs
    # the target law from whatever logits the forward produces).
    gptq_mxu_bf16: bool = False

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def head_dim_(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    @staticmethod
    def qwen2_05b(**kw) -> "ModelConfig":
        """Qwen2.5-0.5B-Instruct geometry (the reference draft model,
        ref: chain-of-thought-hub/gsm8k/eval_speculative_decoding_llm.py:63)."""
        return ModelConfig(**kw)

    @staticmethod
    def qwen2_15b(**kw) -> "ModelConfig":
        """Qwen2.5-1.5B-Instruct geometry."""
        d = dict(hidden_size=1536, intermediate_size=8960, num_layers=28,
                 num_heads=12, num_kv_heads=2, tie_word_embeddings=True)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def qwen2_7b(**kw) -> "ModelConfig":
        d = dict(hidden_size=3584, intermediate_size=18944, num_layers=28,
                 num_heads=28, num_kv_heads=4, tie_word_embeddings=False)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def qwen2_14b(**kw) -> "ModelConfig":
        d = dict(hidden_size=5120, intermediate_size=13824, num_layers=48,
                 num_heads=40, num_kv_heads=8, tie_word_embeddings=False,
                 rms_norm_eps=1e-5)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def qwen2_32b(**kw) -> "ModelConfig":
        d = dict(hidden_size=5120, intermediate_size=27648, num_layers=64,
                 num_heads=40, num_kv_heads=8, tie_word_embeddings=False,
                 rms_norm_eps=1e-5)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def qwen2_72b(**kw) -> "ModelConfig":
        d = dict(hidden_size=8192, intermediate_size=29568, num_layers=80,
                 num_heads=64, num_kv_heads=8, tie_word_embeddings=False,
                 rms_norm_eps=1e-5)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def llama3_8b(**kw) -> "ModelConfig":
        d = dict(vocab_size=128256, hidden_size=4096, intermediate_size=14336,
                 num_layers=32, num_heads=32, num_kv_heads=8,
                 rope_theta=500000.0, rms_norm_eps=1e-5,
                 tie_word_embeddings=False, attention_bias=False,
                 eos_token_id=128009)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def mixtral_8x7b(**kw) -> "ModelConfig":
        """Mixtral-8x7B geometry (the reference's third model family,
        ref: EAGLE-3H/eagle/model/modeling_mixtral_kv.py; train config
        EAGLE-3H/eagle/train/mixtral_8x7B_config.json)."""
        d = dict(vocab_size=32000, hidden_size=4096, intermediate_size=14336,
                 num_layers=32, num_heads=32, num_kv_heads=8,
                 rope_theta=1e6, rms_norm_eps=1e-5,
                 tie_word_embeddings=False, attention_bias=False,
                 eos_token_id=2, num_experts=8, num_experts_per_tok=2)
        d.update(kw)
        return ModelConfig(**d)

    @staticmethod
    def tiny_moe(vocab_size: int = 256, **kw) -> "ModelConfig":
        """Tiny Mixtral-style config for tests."""
        d = dict(num_experts=4, num_experts_per_tok=2, attention_bias=False)
        d.update(kw)
        return ModelConfig.tiny(vocab_size=vocab_size, **d)

    @staticmethod
    def tiny(vocab_size: int = 256, **kw) -> "ModelConfig":
        """Tiny config for tests (random weights)."""
        d = dict(vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
                 num_layers=2, num_heads=4, num_kv_heads=2, dtype=jnp.float32,
                 eos_token_id=vocab_size - 1)
        d.update(kw)
        return ModelConfig(**d)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """GPTQ-style weight-only quantization (ref treats this as a CUDA black box
    via auto-gptq/optimum, SURVEY.md §2.6; here it is a first-class Pallas path)."""

    bits: int = 8                # 8 or 4
    group_size: int = 128        # per-group scales/zeros along the in-features axis
    symmetric: bool = False


@dataclasses.dataclass(frozen=True)
class VerifierConfig:
    """Which acceptance rule to run and its knobs.

    method: 'tokenwise' | 'blockwise' | 'hsd' | 'greedy'
      - 'hsd' is the clever (smart-capping) single-pass form, the shipped
        benchmark config (ref: eval_speculative_qwen_backward_clever.sh:11).
    num_drafts: K independent drafts (multidraft recursive reject sampling,
      ref: transformers/generation/utils.py:5287/5671). 1 = single draft.
    parallel: True = K independent full drafts with prefix-match gating
      (the benchmarked mode); False = striped-tree layout.
    """

    method: str = "hsd"
    gamma: int = 10
    num_drafts: int = 1
    parallel: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh over which the target model is sharded.

    Replaces the reference's layer-wise accelerate.dispatch_model placement
    (SURVEY.md §2.5) with GSPMD tensor parallelism over ICI.
    """

    data: int = 1    # data-parallel axis (requests / training batch)
    model: int = 1   # tensor-parallel axis (heads / ffn / vocab)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.data, self.model)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    verifier: VerifierConfig = VerifierConfig()
    max_new_tokens: int = 512
    max_seq_len: int = 2048
    temperature: float = 1.0
    # logits-processor chain knobs (the reference's prepare_logits_processor
    # / TopKLogitsWarper / TopPLogitsWarper, EAGLE utils.py:38-55); applied
    # identically to draft and target distributions, preserving losslessness
    # w.r.t. the PROCESSED target distribution
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0
