"""Profiling / tracing utilities.

The reference's instrumentation is a cuda-sync Timer context manager and
per-stage wall-clock dicts serialized to _info.jsonl (EAGLE
eagle/model/utils.py:24-35, ea_model.py:207-361). TPU-native equivalents:

  * Timer: block_until_ready-based stage timer (host-visible wall clock);
  * trace(): jax.profiler wrapper producing TensorBoard/perfetto traces;
  * StageClock: accumulates named stage durations across a run and emits the
    reference's stage-dict shape for _info.jsonl rows.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class Timer:
    """with Timer("draft"): ... — synchronizes like the reference's
    torch.cuda.synchronize Timer (EAGLE utils.py:24-35)."""

    def __init__(self, name: str = "", sync=None, verbose: bool = False):
        self.name = name
        self.sync = sync            # optional array/pytree to block on
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"[{self.name}] {self.elapsed*1e3:.2f} ms")
        return False


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (chrome://tracing / TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageClock:
    """Accumulate per-stage timings; emit the reference's stage-dict shape."""

    def __init__(self):
        self.stages: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name].append(time.perf_counter() - t0)

    def row(self) -> Dict[str, List[List[float]]]:
        """One _info.jsonl-shaped record (gen_ea_answer:489-533)."""
        return {f"{k}_time": [v] for k, v in self.stages.items()}

    def totals(self) -> Dict[str, float]:
        return {k: sum(v) for k, v in self.stages.items()}
