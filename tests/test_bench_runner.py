"""Generic benchmark runner tests: question formats, artifacts, metric chain."""
import json

import jax
import jax.numpy as jnp

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine import make_generate
from hsd_tpu.eval.bench_runner import extract_question, load_questions, run_bench
from hsd_tpu.eval.eagle_metrics import evaluate_info_file
from hsd_tpu.eval.gsm8k import ByteTokenizer
from hsd_tpu.models import init_params


def test_extract_question_formats():
    assert extract_question({"turns": ["hi", "x"]}) == "hi"
    assert extract_question({"question": "q"}) == "q"
    assert extract_question({"instruction": "i"}) == "i"
    assert extract_question({"article": "a"}) == "a"


def test_run_bench_artifacts(tmp_path):
    qfile = tmp_path / "question.jsonl"
    qfile.write_text("\n".join(json.dumps(
        {"question_id": i, "turns": [f"Say hello number {i}"]})
        for i in range(3)))
    qs = load_questions(str(qfile), shard="0/1")
    assert len(qs) == 3

    cfg = ModelConfig.tiny(vocab_size=256)
    pd = init_params(cfg, jax.random.PRNGKey(0))
    pt = init_params(cfg, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=4),
                      max_new_tokens=12)
    gen = make_generate(cfg, cfg, eng)
    out = run_bench(qs, ByteTokenizer(), lambda s: s + "\n",
                    lambda p, n, k: gen(pd, pt, p, n, k),
                    str(tmp_path / "out"), "ea_smoke", warmup=1)
    assert out["questions"] == 3
    m = evaluate_info_file(out["info"], gamma=4)
    assert m["questions"] == 3
    assert m["block_efficiency"] > 0
    answers = [json.loads(l) for l in open(out["answers"])]
    assert len(answers) == 3 and "answer" in answers[0]
