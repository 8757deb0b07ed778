"""Generic benchmark runner over question.jsonl files.

Covers the reference's multi-bench eval drivers
(`EAGLE-3H/eagle/evaluation/gen_ea_answer_llama3chat.py` and
`performance_evaluation.py:63-154`): mt_bench / humaneval / alpaca / qa / sum
ship as `question.jsonl` rows with {"question_id", "turns": [...]} (first
turn used); gsm8k rows use {"question", "answer"}; translation/summarization
rows carry their own text fields. One runner handles them via a field mapper,
drives any engine (speculative or EAGLE), and writes the reference's two
artifacts: answers jsonl and `_info.jsonl` (consumed by eval/eagle_metrics).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .eagle_metrics import write_info_row
from .gsm8k import bucket_pad


def extract_question(row: dict) -> str:
    if "turns" in row:
        return row["turns"][0]
    if "question" in row:
        return row["question"]
    if "instruction" in row:
        return row["instruction"]
    for k in ("text", "article", "prompt"):
        if k in row:
            return row[k]
    raise KeyError(f"no question field in row keys={list(row)}")


def load_questions(path: str, limit: Optional[int] = None,
                   shard: Optional[str] = None) -> List[dict]:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if shard:
        i, n = map(int, shard.split("/"))
        rows = rows[i::n]
    return rows[:limit] if limit else rows


def run_bench(questions: List[dict], tokenizer, prompt_wrap: Callable[[str], str],
              generate: Callable, out_dir: str, tag: str,
              warmup: int = 1, seed: int = 0) -> dict:
    """generate(prompt_ids [P], prompt_len, key) -> object with
    .tokens/.length/.accepts/.draft_lens/.blocks (GenerateResult-like).

    Writes `{tag}.jsonl` (answers) and `{tag}_info.jsonl` (per-question
    stage/accept telemetry in the reference's shape,
    gen_ea_answer_llama3chat.py:489-533). Warmup runs the first question
    `warmup` extra times untimed (ref does 3, :311-389)."""
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    ans_path = os.path.join(out_dir, f"{tag}.jsonl")
    info_path = os.path.join(out_dir, f"{tag}_info.jsonl")
    total_time = 0.0
    with open(ans_path, "w") as fa, open(info_path, "w") as fi:
        for qi, row in enumerate(questions):
            text = prompt_wrap(extract_question(row))
            ids = tokenizer.encode(text)
            padded, n = bucket_pad(ids)
            if qi == 0:
                for w in range(warmup):
                    r = generate(jnp.asarray(padded), jnp.int32(n),
                                 jax.random.fold_in(key, 10_000 + w))
                    r.tokens.block_until_ready()
            t0 = time.perf_counter()
            res = generate(jnp.asarray(padded), jnp.int32(n),
                           jax.random.fold_in(key, qi))
            res.tokens.block_until_ready()
            dt = time.perf_counter() - t0
            total_time += dt
            out_ids = np.asarray(res.tokens)[len(padded):int(res.length)]
            answer = tokenizer.decode(out_ids.tolist())
            nb = int(res.blocks)
            fa.write(json.dumps({
                "question_id": row.get("question_id", qi),
                "answer": answer,
                "new_tokens": int(res.ncommit) if hasattr(res, "ncommit")
                else len(out_ids),
            }) + "\n")
            write_info_row(
                fi,
                np.asarray(res.accepts)[:nb].tolist(),
                np.asarray(res.draft_lens)[:nb].tolist(),
                dt)
    return {"answers": ans_path, "info": info_path,
            "questions": len(questions), "total_time_s": total_time}
