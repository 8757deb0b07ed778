"""EAGLE-bench metrics from `*_info.jsonl` artifacts.

Formula parity with `EAGLE-3H/performance_evaluation.py:122-187`:
  BE = sum(accept_length | draft_length == gamma) / count(draft == gamma)
  DS = count(draft == gamma) / total generate_time * gamma
The reference ships real per-question result files under
`EAGLE-3H/results/{h100,h200}_{eagle,HSD}/` which serve as regression
fixtures for this module (tests/test_eval_fixtures.py).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np


def _flatten(x):
    if x and isinstance(x, list) and isinstance(x[0], list):
        return x[0]
    return x


def evaluate_info_rows(rows: Iterable[dict], gamma: int = 7
                       ) -> Dict[str, float]:
    sample = cnt = 0
    total_time = 0.0
    nrows = 0
    for d in rows:
        da = np.asarray(_flatten(d.get("draft_length", [[]])))
        aa = np.asarray(_flatten(d.get("accept_length", [[]])))
        gt = d.get("generate_time", [0.0])
        gt = gt[0] if isinstance(gt, list) else gt
        sample += aa[da == gamma].sum()
        cnt += int((da == gamma).sum())
        total_time += float(gt)
        nrows += 1
    be = sample / cnt if cnt else 0.0
    ds = cnt / total_time * gamma if total_time > 0 else 0.0
    return {"block_efficiency": float(be), "decoding_speed": float(ds),
            "avg_time": total_time / nrows if nrows else 0.0,
            "questions": nrows}


def evaluate_info_file(path: str, gamma: int = 7) -> Optional[Dict[str, float]]:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    return evaluate_info_rows(rows, gamma)


def write_info_row(fh, accepts, draft_lens, generate_time: float,
                   stage_times: Optional[Dict[str, list]] = None):
    """Emit one `_info.jsonl` row in the reference's shape
    (gen_ea_answer_llama3chat.py:489-533) from engine telemetry."""
    row = {
        "accept_length": [list(map(int, accepts))],
        "draft_length": [list(map(int, draft_lens))],
        "generate_time": [float(generate_time)],
    }
    if stage_times:
        row.update(stage_times)
    fh.write(json.dumps(row) + "\n")
