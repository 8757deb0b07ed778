"""Standalone plug-and-play EAGLE class — the TPU-native counterpart of the
reference's `EAGLE-3H/eagle/modeling_eagle.py` (class `EAGLE`,
`forward_with_tree_mask`, its own `evaluate_posterior`, `generate`; ref
:1-1736).

The reference ships this as a self-contained legacy API that binds a base
model and a draft head without the `EaModel`/evaluation plumbing. Here the
same surface is a thin facade over the framework's single model stack
(SURVEY.md §7 "one model stack"): the class owns the configs + params, caches
jitted generate closures per (mode, max_new_tokens, temperature), and exposes
the tree-masked forward as a first-class call.

Usage:
    eagle = Eagle.from_pretrained(base_dir, head_dir)         # HF checkpoints
    eagle = Eagle(cfg_t, params_t, ecfg, params_e)            # in-memory
    out   = eagle.generate(prompt_ids, max_new_tokens=64)     # EAGLE decode
    base  = eagle.naive_generate(prompt_ids, max_new_tokens=64)  # AR baseline
    logits, cache = eagle.forward_with_tree_mask(tokens, tree_mask, cache)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig, ModelConfig
from .engine.eagle_engine import (EagleGenerateResult, default_feature_layers,
                                  make_eagle_generate)
from .engine.kvcache import KVCache, init_cache
from .engine.speculative import make_autoregressive
from .models import transformer
from .models.eagle import EagleConfig, EagleParams
from .verify.trie import (verify_trie_greedy, verify_trie_hsd,
                          verify_trie_typical)


def evaluate_posterior(key: jax.Array, candidates: jax.Array, p: jax.Array,
                       mode: str = "hsd"):
    """Standalone trie verification — the reference class carries its own
    `evaluate_posterior` copy (modeling_eagle.py); here it simply dispatches
    to the shared verified kernels (verify/trie.py).

    candidates: [R, L] root->leaf path rows (col 0 = committed root, -1 pad);
    p: [R, L, V] target rows after each path position. Returns
    (best_row, accept_len, sample_p)."""
    if mode == "greedy":
        return verify_trie_greedy(candidates, p)
    if mode == "typical":
        return verify_trie_typical(key, candidates, p)
    if mode == "hsd":
        return verify_trie_hsd(key, candidates, p)
    raise ValueError(f"unknown mode {mode!r}")


class Eagle:
    """Standalone base-model + EAGLE-head bundle (ref modeling_eagle.EAGLE)."""

    def __init__(self, cfg_target: ModelConfig, params_target,
                 ecfg: EagleConfig, params_eagle: EagleParams,
                 mode: str = "hsd"):
        self.cfg_target = cfg_target
        self.params_target = params_target
        self.ecfg = ecfg
        self.params_eagle = params_eagle
        self.mode = mode
        self._gen_cache = {}

    # -- construction ------------------------------------------------------
    @classmethod
    def from_pretrained(cls, base_path: str, head_path: str,
                        mode: str = "hsd", dtype=jnp.bfloat16,
                        **head_overrides) -> "Eagle":
        """Load a HF base checkpoint directory + an EAGLE head checkpoint
        directory (the reference's `EAGLE.from_pretrained`)."""
        from .models.loader import config_from_hf, load_eagle_hf, load_hf

        cfg_t = config_from_hf(base_path)
        params_t = load_hf(base_path, cfg_t)
        embed = params_t.embed
        ecfg = EagleConfig.from_json(
            f"{head_path}/config.json",
            target_hidden_size=cfg_t.hidden_size, dtype=dtype,
            **head_overrides)
        params_e = load_eagle_hf(head_path, embed, dtype=dtype)
        return cls(cfg_t, params_t, ecfg, params_e, mode=mode)

    # -- tree-masked forward -----------------------------------------------
    def forward_with_tree_mask(self, tokens: jax.Array,
                               tree_mask: Optional[jax.Array] = None,
                               cache: Optional[KVCache] = None,
                               positions: Optional[jax.Array] = None,
                               max_len: int = 0,
                               ) -> Tuple[jax.Array, KVCache]:
        """Target forward with the trie's ancestor-closure mask injected into
        the causal attention mask (ref modeling_eagle.forward_with_tree_mask;
        mechanism: modeling_llama_kv.py:1036-1042).

        tokens: [B, T] (or [T]); tree_mask: [T, T] bool, True = attend
        (self + ancestors); cache: appended to when given, else a fresh cache
        of max_len (default fits this call) is created. Returns
        (logits [B, T, V] f32, updated cache)."""
        if tokens.ndim == 1:
            tokens = tokens[None, :]
        B, T = tokens.shape
        if cache is None:
            cache = init_cache(self.cfg_target, B, max_len or T)
        bias = None
        if tree_mask is not None:
            bias = jnp.where(tree_mask, 0.0, -1e30).astype(jnp.float32)
        logits, cache = transformer.forward(
            self.cfg_target, self.params_target, tokens.astype(jnp.int32),
            cache, attn_bias=bias, positions=positions)
        return logits, cache

    # -- generation ----------------------------------------------------------
    def _engine(self, max_new_tokens: int, temperature: float, mode: str):
        k = ("eagle", mode, max_new_tokens, temperature)
        if k not in self._gen_cache:
            eng = EngineConfig(max_new_tokens=max_new_tokens,
                               temperature=temperature)
            self._gen_cache[k] = make_eagle_generate(
                self.cfg_target, self.ecfg, eng, mode=mode)
        return self._gen_cache[k]

    def generate(self, prompt_ids, max_new_tokens: int = 64,
                 temperature: float = 1.0, mode: Optional[str] = None,
                 key: Optional[jax.Array] = None) -> EagleGenerateResult:
        """EAGLE speculative decode (ref EAGLE.eagenerate path). prompt_ids:
        1-D int array/list. Returns the framework's EagleGenerateResult;
        committed ids = tokens[:length]."""
        mode = mode or self.mode
        key = key if key is not None else jax.random.PRNGKey(0)
        prompt = jnp.asarray(np.asarray(prompt_ids), jnp.int32)
        gen = self._engine(max_new_tokens, temperature, mode)
        return gen(self.params_target, self.params_eagle, prompt,
                   jnp.int32(prompt.shape[0]), key)

    def naive_generate(self, prompt_ids, max_new_tokens: int = 64,
                       temperature: float = 1.0,
                       key: Optional[jax.Array] = None):
        """Plain AR baseline on the base model (ref naivegenerate,
        ea_model.py:368-462). Returns (tokens, length) device arrays."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k = ("ar", max_new_tokens, temperature)
        if k not in self._gen_cache:
            eng = EngineConfig(max_new_tokens=max_new_tokens,
                               temperature=temperature)
            self._gen_cache[k] = make_autoregressive(self.cfg_target, eng)
        prompt = jnp.asarray(np.asarray(prompt_ids), jnp.int32)
        return self._gen_cache[k](self.params_target, prompt,
                                  jnp.int32(prompt.shape[0]), key)

    def tune_total_tokens(self, prompt_ids, candidates=(23, 47, 59),
                          max_new_tokens: int = 32,
                          key: Optional[jax.Array] = None):
        """Auto-tune the trie size by timing (ref ea_model.py:143-164);
        updates self.ecfg in place and returns the timing stats."""
        from .engine.eagle_engine import autotune_total_tokens

        key = key if key is not None else jax.random.PRNGKey(0)
        prompt = jnp.asarray(np.asarray(prompt_ids), jnp.int32)
        eng = EngineConfig(max_new_tokens=max_new_tokens)
        best, stats = autotune_total_tokens(
            self.cfg_target, self.ecfg, eng, self.params_target,
            self.params_eagle, prompt, jnp.int32(prompt.shape[0]), key,
            candidates=candidates, mode=self.mode)
        self.ecfg = best
        self._gen_cache.clear()
        return stats
