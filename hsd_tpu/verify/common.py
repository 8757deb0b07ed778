"""Shared types and helpers for the verification kernels.

All verifiers share one contract (re-derived from the behavioral spec of
`transformers/generation/utils.py:5243-5780` in the reference, see
SURVEY.md §2.4):

Inputs (single verification problem; vmap over a request batch):
  draft_tokens : [K, gamma] int32  — K candidate drafts
  q            : [K, gamma, V]     — draft-model probs; q[b, j] = q(. | prefix, x_{b,<j})
  p            : [K, gamma+1, V]   — target probs incl. the bonus position
  key          : jax PRNG key

Output: VerifyResult. `tokens[:n_matches]` are accepted draft tokens of draft
`draft_index`; `tokens[n_matches]` is the resampled / bonus token; the engine
commits `n_matches + 1` tokens (EOS truncation is the engine's job, matching
the `is_done_candidate` / stopping-criteria rules at utils.py:5544-5579).

Everything is fixed-shape and jit-compatible: no Python recursion, no host
syncs, no data-dependent shapes (the reference's `.item()` loop nest becomes
masked vector math).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Smallest float32-safe clamp for logs of probabilities that are positive by
# construction (e.g. q of a token actually sampled from q).
TINY = 1e-30


class VerifyResult(NamedTuple):
    tokens: jax.Array        # [gamma+1] int32
    n_matches: jax.Array     # int32 scalar: accepted draft tokens
    draft_index: jax.Array   # int32 scalar: which draft row was committed
    rounds: jax.Array        # int32 scalar: multidraft rounds actually executed


class Telemetry(NamedTuple):
    """Per-block acceptance telemetry, the counterpart of the reference's
    `counts` / `return_probs=True` channel (utils.py:4644-4647, :5583).

    Arrays carry one row PER MULTIDRAFT ROUND (the reference accumulates per
    inner step; rows of rounds that never ran — gated out or already done —
    stay zero; VerifyResult.rounds says how many ran)."""

    step_back_probs: jax.Array  # [K, gamma] float32
    p_i: jax.Array              # [K, gamma] float32
    q_i: jax.Array              # [K, gamma] float32


def gather_token_probs(dist: jax.Array, tokens: jax.Array) -> jax.Array:
    """dist: [T, V], tokens: [T] -> probs [T]."""
    return jnp.take_along_axis(dist, tokens[:, None], axis=-1)[:, 0]


def categorical(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample an index from an (unnormalized, nonnegative) probability vector."""
    return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 0.0)))


def normalize(probs: jax.Array, fallback: jax.Array) -> jax.Array:
    """probs / sum(probs); if the mass is zero return `fallback`.

    The reference divides by zero and relies on NaN semantics / ad-hoc guards
    (utils.py:5322, EAGLE utils.py:615-621); here the degenerate case is
    explicit.
    """
    s = jnp.sum(probs, axis=-1, keepdims=True)
    ok = s > 0
    return jnp.where(ok, probs / jnp.where(ok, s, 1.0), fallback)


def prefix_matches(draft_tokens: jax.Array, b: jax.Array, ind: jax.Array,
                   n: jax.Array) -> jax.Array:
    """True iff draft b's first n tokens equal draft ind's first n tokens.

    This is the parallel-multidraft gate (utils.py:5291/5674): a later draft
    can only continue verification if it shares the already-accepted prefix.
    """
    gamma = draft_tokens.shape[1]
    pos = jnp.arange(gamma)
    same = draft_tokens[b] == draft_tokens[ind]
    return jnp.all(jnp.where(pos < n, same, True))


def window_index(m: jax.Array, gamma: int):
    """Absolute row indices and validity mask for the window [m, gamma).

    The reference re-slices tensors to length gamma - n_matches each round
    (dynamic shapes); on TPU we keep fixed gamma-length windows and mask.
    """
    rel = jnp.arange(gamma)
    idx = jnp.clip(m + rel, 0, gamma - 1)
    valid = rel < gamma - m
    return idx, valid


def last_true_index(flags: jax.Array) -> jax.Array:
    """Index of the last True in a 1-D bool array; 0 if none.

    Vectorized replacement for the reference's
    `L - 1 - torch.flip(~step_back).max(-1)[1]` stop-position search
    (utils.py:5488-5491).
    """
    n = flags.shape[0]
    last = n - 1 - jnp.argmax(flags[::-1])
    return jnp.where(jnp.any(flags), last, 0)


def scatter_commit(draft_row: jax.Array, extra_token: jax.Array,
                   n_matches: jax.Array) -> jax.Array:
    """Build the committed token vector: draft_row[:n] + [extra] (+ padding)."""
    gamma = draft_row.shape[0]
    pos = jnp.arange(gamma + 1)
    padded = jnp.concatenate([draft_row, jnp.zeros((1,), draft_row.dtype)])
    return jnp.where(pos < n_matches, padded,
                     jnp.where(pos == n_matches, extra_token, 0)).astype(jnp.int32)
