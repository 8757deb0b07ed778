"""Acceptance kernels: tokenwise / blockwise / HSD / greedy / trie-HSD.

All are pure fixed-shape JAX functions (jit/vmap-compatible) with explicit
PRNG keys — the property that makes losslessness testable (SURVEY.md §7).
"""
from .common import Telemetry, VerifyResult
from .tokenwise import verify_tokenwise
from .blockwise import verify_blockwise, verify_greedy
from .hsd import verify_hsd
from .recursive import recursive_round
from .dispatch import verify
from .trie import verify_trie_greedy, verify_trie_hsd, verify_trie_typical

__all__ = [
    "Telemetry", "VerifyResult", "verify", "verify_tokenwise",
    "verify_blockwise", "verify_greedy", "verify_hsd", "recursive_round",
    "verify_trie_greedy", "verify_trie_hsd", "verify_trie_typical",
]
