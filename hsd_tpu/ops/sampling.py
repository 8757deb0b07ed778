"""Sampling / logits processing with explicit PRNG keys.

Replaces the reference's HF logits-processor chain + `torch.multinomial`
(prepare_logits_processor, EAGLE utils.py:38-55) with pure-jax equivalents.
Explicit key threading is what makes losslessness bit-testable (SURVEY.md §7).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def process_logits(logits: jax.Array, temperature: float = 1.0,
                   top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """Return a probability distribution after temperature / top-k / top-p.

    temperature == 0 is greedy (one-hot argmax). top_k/top_p are static.
    """
    if temperature == 0.0:
        return jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                              dtype=jnp.float32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose prefix mass (exclusive) is < top_p
        keep_sorted = (cum - probs) < top_p
        kth = jnp.max(jnp.where(keep_sorted, sorted_logits, -jnp.inf),
                      axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.nn.softmax(logits, axis=-1)


def processor(temperature: float, top_k: int = 0, top_p: float = 1.0):
    """Closure form of process_logits — the engine-side equivalent of the
    reference's prepared logits-processor chain (EAGLE utils.py:38-55)."""
    def proc(logits: jax.Array) -> jax.Array:
        return process_logits(logits, temperature, top_k, top_p)
    return proc


def sample(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Categorical sample over the last axis of a probability array."""
    return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-38)))
