#!/usr/bin/env python
"""Standalone iteration harness for bench.py's realistic row: runs
_realistic_row at one or more seeds (and the BENCH_RDRAFT_* capacity knobs)
without the 14B build, printing the uplift ladder per run. Used to fix the
r5 dress-rehearsal regression (calibration quit at tokenwise BE 6.5 ->
uplift 0.975) and to gauge pair-to-pair spread.

Usage: IR_SEEDS=40,41,42 python scripts/iter_realistic.py
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench

SEEDS = [int(s) for s in os.environ.get("IR_SEEDS", "40").split(",")]


def main():
    print("backend:", jax.default_backend(),
          "draft:", os.environ.get("BENCH_RDRAFT_LAYERS", "1"), "L x",
          os.environ.get("BENCH_RDRAFT_HIDDEN", "96"), "H", flush=True)
    key = jax.random.PRNGKey(0)
    for s in SEEDS:
        t0 = time.time()
        r = bench._realistic_row(jax.random.fold_in(key, s))
        print(f"seed={s} [{time.time() - t0:.0f}s] "
              f"tok={r['rows']['tokenwise']['be']:.3f} "
              f"blk={r['rows']['blockwise']['be']:.3f} "
              f"hsd={r['rows']['hsd']['be']:.3f} "
              f"uplift_hsd={r['uplift_hsd_vs_tokenwise']:.4f}"
              f"±{r.get('uplift_hsd_ci95', 0):.3f} "
              f"uplift_blk={r['uplift_blockwise_vs_tokenwise']:.4f}"
              f"±{r.get('uplift_blockwise_ci95', 0):.3f} "
              f"tau={r['tau']} alpha={r['alpha']} "
              f"hard={r['frac_hard_disagree']} cal={r['cal']}", flush=True)


if __name__ == "__main__":
    main()
