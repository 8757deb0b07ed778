"""Eval harness tests: metric formula parity + a tiny end-to-end GSM8K run
with random models and the byte tokenizer (no network, no real weights)."""
import json

import jax
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.eval.gsm8k import (ByteTokenizer, EvalConfig, bucket_pad,
                                build_prompt, load_gsm8k_jsonl, run_eval)
from hsd_tpu.eval.metrics import (accuracy, block_efficiency, decoding_speed,
                                  extract_answer)
from hsd_tpu.eval.metrics import test_answer as check_answer
from hsd_tpu.models import init_params


def test_answer_extraction():
    assert extract_answer("the answer is 42.") == "42"
    assert extract_answer("so 3.5 plus 2 = 5.5") == "5.5"
    assert extract_answer("no numbers here") is None
    assert check_answer("A_model: ... the result is 18", "A: #### 18")
    assert not check_answer("result 17", "#### 18")
    assert accuracy(["x 18", "y 3"], ["#### 18", "#### 4"]) == 0.5


def test_block_efficiency_full_gamma_filter():
    accepts = [[9, 4, 9], [2]]
    dls = [[10, 3, 10], [10]]
    # steps with draft_len==10: accepts 9,9,2 -> committed 10,10,3 -> mean 23/3
    assert abs(block_efficiency(accepts, dls, 10) - 23 / 3) < 1e-9


def test_decoding_speed_time_scaling():
    accepts = [[9, 4]]
    dls = [[10, 10]]
    ds = decoding_speed(accepts, dls, [2.0], 10)
    assert abs(ds - (10 + 5) / 2.0) < 1e-9


def test_bucket_pad():
    ids = list(range(100))
    padded, n = bucket_pad(ids)
    assert padded.shape[0] == 512 and n == 100
    assert padded[-1] == 99 and padded[0] == 0


def test_gsm8k_end_to_end_smoke(tmp_path):
    data = tmp_path / "test.jsonl"
    rows = [{"question": f"What is {i} + {i}?", "answer": f"#### {2*i}"}
            for i in range(10)]
    data.write_text("\n".join(json.dumps(r) for r in rows))
    qs = load_gsm8k_jsonl(str(data), stride=5)
    assert len(qs) == 2

    cfg = ModelConfig.tiny(vocab_size=256)
    pd = init_params(cfg, jax.random.PRNGKey(0))
    pt = init_params(cfg, jax.random.PRNGKey(1))
    ev = EvalConfig(
        engine=EngineConfig(
            verifier=VerifierConfig(method="hsd", gamma=4, num_drafts=1),
            max_new_tokens=16),
        out_dir=str(tmp_path / "out"), tag="smoke")
    summary = run_eval(cfg, cfg, pd, pt, ByteTokenizer(), qs, "Q: 1+1?\nA: 2",
                       ev)
    assert summary["questions"] == 2
    assert summary["block_efficiency"] > 0
    assert (tmp_path / "out" / "answers_smoke.txt").exists()
    counts = json.loads((tmp_path / "out" / "counts_smoke.json").read_text())
    assert len(counts) == 2 and "accepts" in counts[0]


def test_default_prompt_library():
    """G5 parity: the packaged prompt library exists, each shot carries a
    final 'The answer is N' line the metrics regex extracts."""
    from hsd_tpu.eval.gsm8k import default_prompt_path
    text = open(default_prompt_path()).read()
    shots = [s for s in text.split("\n\n") if s.strip()]
    assert len(shots) == 8
    for s in shots:
        assert s.startswith("Question: ")
        assert "Let's think step by step" in s
        ans = extract_answer(s.rsplit("The answer is", 1)[1])
        assert ans is not None
