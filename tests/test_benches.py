"""Multi-bench loaders + reference-shaped driver (E7 parity) tests."""
import json

import jax
import jax.numpy as jnp
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import make_generate
from hsd_tpu.eval.benches import (ChatTemplate, get_system_prompt,
                                  load_bench_questions,
                                  load_cnndailymail_questions,
                                  load_flores200_questions,
                                  load_humaneval_questions, reorg_answer_file,
                                  run_multibench, strip_output)
from hsd_tpu.eval.eagle_metrics import evaluate_info_file
from hsd_tpu.eval.gsm8k import ByteTokenizer
from hsd_tpu.models import init_params


def _write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows))
    return str(path)


def test_system_prompts():
    assert "translation" in get_system_prompt("flores200")
    assert "summar" in get_system_prompt("cnndailymail")
    assert get_system_prompt("mt_bench") == get_system_prompt("qa")


def test_humaneval_formatting(tmp_path):
    p = _write_jsonl(tmp_path / "q.jsonl", [
        {"task_id": "HumanEval/0", "prompt": "def f():\n",
         "canonical_solution": "    return 1\n"}])
    qs = load_humaneval_questions(p)
    assert qs[0]["turns"][0].startswith("Complete the code I provided.\n")
    assert "def f():" in qs[0]["turns"][0]
    assert qs[0]["reference"] == ["    return 1\n"]


def test_cnndm_truncation(tmp_path):
    p = _write_jsonl(tmp_path / "t.jsonl", [
        {"article": "x" * 50, "highlights": "h"},
        {"article": "y" * 9000, "highlights": "h2"}])
    qs = load_cnndailymail_questions(p, max_article_chars=100)
    assert "x" * 50 in qs[0]["turns"][0]
    assert "summarize" in qs[0]["turns"][0]
    # long article truncated with ellipsis
    assert "y" * 100 + "..." in qs[1]["turns"][0]
    assert "y" * 101 not in qs[1]["turns"][0]


def test_flores_filter_and_prompt(tmp_path):
    p = _write_jsonl(tmp_path / "f.jsonl", [
        {"source": "hello", "target": "bonjour",
         "source_lang": "eng_Latn", "target_lang": "fra_Latn"},
        {"source": "hallo", "target": "x",
         "source_lang": "deu_Latn", "target_lang": "fra_Latn"}])
    qs = load_flores200_questions(p)
    assert len(qs) == 1  # wrong-pair row filtered out
    assert "Translate the following Eng text to Fra" in qs[0]["turns"][0]
    assert qs[0]["reference"] == ["bonjour"]


def test_bench_routing_and_shard(tmp_path):
    rows = [{"question_id": i, "turns": [f"q{i}", f"follow{i}"]}
            for i in range(6)]
    p = _write_jsonl(tmp_path / "question.jsonl", rows)
    qs = load_bench_questions("mt_bench", p, begin=1, end=5)
    assert [q["question_id"] for q in qs] == [1, 2, 3, 4]
    qs = load_bench_questions("mt_bench", p, shard="1/2")
    assert [q["question_id"] for q in qs] == [1, 3, 5]


def test_chat_templates_multiturn():
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "U1"},
            {"role": "assistant", "content": "A1"},
            {"role": "user", "content": "U2"}]
    q = ChatTemplate("qwen").render(msgs)
    assert q.count("<|im_start|>") == 5 and q.endswith("assistant\n")
    l3 = ChatTemplate("llama3").render(msgs)
    assert l3.startswith("<|begin_of_text|>") and "U2" in l3
    assert l3.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_strip_output():
    t = ChatTemplate("qwen")
    assert strip_output("hello<|im_end|>\njunk", t) == "hello"
    assert strip_output("  plain  ", t) == "plain"


@pytest.mark.parametrize("engine", ["spec"])
def test_run_multibench_artifacts(tmp_path, engine):
    rows = [{"question_id": 10 + i, "turns": [f"Say {i}", "More?"]}
            for i in range(2)]
    cfg = ModelConfig.tiny(vocab_size=256)
    pd = init_params(cfg, jax.random.PRNGKey(0))
    pt = init_params(cfg, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=4),
                       max_new_tokens=8)
    gen = make_generate(cfg, cfg, eng)
    out = run_multibench(
        rows, ByteTokenizer(), lambda p, n, k: gen(pd, pt, p, n, k),
        str(tmp_path), "mt", bench_name="mt_bench", num_choices=2,
        warmup=1, template=ChatTemplate("plain"))
    answers = [json.loads(l) for l in open(out["answers"])]
    assert len(answers) == 2
    a = answers[0]
    assert a["question_id"] == 10 and len(a["choices"]) == 2
    c = a["choices"][0]
    # two turns per choice, reference shape
    assert len(c["turns"]) == 2 == len(c["new_tokens"]) == len(c["wall_time"])
    assert a["answer_id"] and a["model_id"] == "hsd_tpu"
    # info rows: one per (question, choice), fields list-over-turns
    infos = [json.loads(l) for l in open(out["info"])]
    assert len(infos) == 4
    assert len(infos[0]["accept_length"]) == 2  # turns
    assert isinstance(infos[0]["accept_length"][0], list)  # per-block
    m = evaluate_info_file(out["info"], gamma=4)
    assert m["questions"] == 4 and m["block_efficiency"] > 0
    # different choices see different PRNG folds -> keys differ (sampled
    # streams may coincide on tiny vocab, so just check determinism instead)
    out2 = run_multibench(
        rows, ByteTokenizer(), lambda p, n, k: gen(pd, pt, p, n, k),
        str(tmp_path), "mt2", bench_name="mt_bench", num_choices=2,
        warmup=0, template=ChatTemplate("plain"))
    a2 = [json.loads(l) for l in open(out2["answers"])]
    assert [c["turns"] for c in a2[0]["choices"]] == \
        [c["turns"] for c in answers[0]["choices"]]


def test_reorg_answer_file(tmp_path):
    p = tmp_path / "ans.jsonl"
    rows = [{"question_id": 3, "v": "old"}, {"question_id": 1, "v": "a"},
            {"question_id": 3, "v": "new"}]
    _write_jsonl(p, rows)
    reorg_answer_file(str(p))
    out = [json.loads(l) for l in open(p)]
    assert [r["question_id"] for r in out] == [1, 3]
    assert out[1]["v"] == "new"  # dedup keeps the last


# ---------------------------------------------------------------------------
# Shipped sample data (data/<bench>/question.jsonl) — every checked-in
# fixture must parse through its real loader so scripts/run_bench.py runs
# out of the box (VERDICT r2 item 8; ref ships eagle/data/*/question.jsonl).
# ---------------------------------------------------------------------------

_DATA_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__file__)),
    "data")

_ALL_BENCHES = ["mt_bench", "alpaca", "qa", "sum", "humaneval", "gsm8k",
                "flores200", "cnndailymail"]


@pytest.mark.parametrize("bench", _ALL_BENCHES)
def test_shipped_fixture_loads(bench):
    import os
    path = os.path.join(_DATA_DIR, bench, "question.jsonl")
    assert os.path.exists(path), path
    rows = load_bench_questions(bench, path)
    assert len(rows) >= 3
    for r in rows:
        assert "question_id" in r and "turns" in r
        assert all(isinstance(t, str) and t for t in r["turns"])
    if bench == "mt_bench":
        assert all(len(r["turns"]) == 2 for r in rows)


def test_shipped_fixture_end_to_end(tmp_path):
    """Drive the mt_bench sample through the whole loader -> template ->
    engine -> artifacts pipeline (random tiny weights, byte tokenizer)."""
    import os
    rows = load_bench_questions(
        "mt_bench", os.path.join(_DATA_DIR, "mt_bench", "question.jsonl"),
        end=1)
    cfg = ModelConfig.tiny(vocab_size=300)
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                       max_new_tokens=8)
    gen_fn = make_generate(cfg, cfg, eng)
    generate = lambda p, n, k: gen_fn(params, params, p, n, k)
    summary = run_multibench(rows, ByteTokenizer(), generate, str(tmp_path),
                             "sample", warmup=0)
    assert summary["questions"] == 1 and summary["new_tokens"] > 0
    m = evaluate_info_file(summary["info"], gamma=3)
    assert m["block_efficiency"] >= 1.0
