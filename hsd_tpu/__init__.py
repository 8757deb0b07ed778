"""hsd_tpu — TPU-native Hierarchical Speculative Decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ZhouYuxuanYX/Hierarchical-Speculative-Decoding (lossless hierarchical
speculative decoding, arXiv 2601.05724): quantized Qwen2/Llama targets,
draft-model and EAGLE-3 trie drafting, and a family of lossless
verification rules (tokenwise / blockwise / HSD / trie-HSD) implemented
as vectorized, jit-compiled acceptance kernels.

Layout (maps to the reference per SURVEY.md §2):
  verify/    acceptance kernels (ref: transformers/generation/utils.py:5243-5780)
  models/    Qwen2/Llama decoder + EAGLE-3 head in pure JAX
  engine/    KV cache w/ rollback, draft loop, speculative orchestration
  ops/       Pallas kernels (GPTQ dequant-matmul, sampling, attention)
  parallel/  mesh + sharding specs (replaces accelerate/DeepSpeed/Ray)
  eval/      GSM8K + spec-decode metrics (BE / DS / accuracy)
  train/     EAGLE draft-head training (data-parallel pjit)
  utils/     telemetry, profiling
"""

__version__ = "0.1.0"
