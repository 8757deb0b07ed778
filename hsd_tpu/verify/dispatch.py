"""Single entry point for the verification kernels.

Replaces the reference's flag-dispatched mega-function
(`transformers/generation/utils.py:5243-5780`, flags `backward/blockwise/
clever/multidraft/parallel`) with one typed `method` switch. `method` is a
static (compile-time) argument.
"""
from __future__ import annotations

import functools

import jax

from .blockwise import verify_blockwise, verify_greedy
from .hsd import verify_hsd
from .tokenwise import verify_tokenwise

import functools as _ft

_METHODS = {
    "tokenwise": verify_tokenwise,
    "blockwise": verify_blockwise,
    # exact HSD (capped frontier — lossless, see docs/LOSSLESSNESS.md)
    "hsd": verify_hsd,
    # behavioral parity with the committed reference (raw-joint frontier)
    "hsd_ref": _ft.partial(verify_hsd, frontier="raw"),
    "greedy": verify_greedy,
}


@functools.partial(jax.jit, static_argnames=("method", "return_telemetry",
                                             "num_drafts", "striped"))
def verify(method: str, key, draft_tokens, q, p, return_telemetry: bool = False,
           num_drafts: int = 0, striped: bool = False):
    """Verify drafts of gamma tokens; see verify/common.py for the contract.

    method: 'tokenwise' | 'blockwise' | 'hsd' | 'greedy' (static).
    num_drafts: K verification rounds (defaults to the row count);
    striped: striped-tree row layout instead of parallel independent drafts.
    """
    fn = _METHODS[method]
    if method in ("tokenwise", "hsd", "hsd_ref"):
        return fn(key, draft_tokens, q, p, return_telemetry=return_telemetry,
                  num_drafts=num_drafts, striped=striped)
    return fn(key, draft_tokens, q, p)
