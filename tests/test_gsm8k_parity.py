"""End-to-end accuracy-parity smoke through the REAL GSM8K harness path
(VERDICT r2 item 10) — the e2e analog of the reference's Table-1 check
(README.md:90-119: tokenwise and HSD are both lossless, so their output
distributions — and hence answer distributions — agree up to sampling
noise).

Setup: byte tokenizer + a tiny draft/target pair with real divergence
(target = draft trunk with sharpened embeddings), 20 self-composed questions
x several sampled generations per question, driven through
`eval.gsm8k.run_eval` (prompt build -> bucket pad -> engine -> artifacts ->
counts). The per-output "answer" is the first digit byte the model emits —
a 10-way categorical whose law must agree across verifiers."""
import collections
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.eval.gsm8k import ByteTokenizer, EvalConfig, run_eval
from hsd_tpu.models import init_params

CFG = ModelConfig.tiny(vocab_size=256, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2)

QUESTIONS = [
    {"question": f"A box holds {3 + i} pears and gains {2 + i} more. "
                 "How many pears are in the box?",
     "answer": f"#### {5 + 2 * i}"}
    for i in range(20)
]


def _first_digit(text: str):
    m = re.search(r"[0-9]", text)
    return m.group(0) if m else None


def _run(method, copies=5):
    import dataclasses
    pd = init_params(CFG, jax.random.PRNGKey(0))
    pt = pd._replace(embed=pd.embed * 1.3)   # real draft/target divergence
    eng = EngineConfig(verifier=VerifierConfig(method=method, gamma=4),
                       max_new_tokens=48)
    rows = [q for q in QUESTIONS for _ in range(copies)]
    summary, answers = None, []

    ev = EvalConfig(engine=eng, out_dir="/tmp/gsm8k_parity", tag=method,
                    seed=0)
    # short shots text keeps every prompt in the smallest (512) bucket:
    # ONE engine compile per method
    shots = "Question: 1 plus 1?\nLet's think step by step\nThe answer is 2\n"
    summary = run_eval(CFG, CFG, pd, pt, ByteTokenizer(), rows, shots, ev)
    answers = summary["model_answers"]
    return summary, answers


def test_gsm8k_answer_distribution_parity():
    s_tok, a_tok = _run("tokenwise")
    s_hsd, a_hsd = _run("hsd")
    assert len(a_tok) == len(a_hsd) == 100

    def dist(answers):
        c = collections.Counter(_first_digit(a) for a in answers)
        n = sum(c.values())
        return {k: v / n for k, v in c.items()}

    d_t, d_h = dist(a_tok), dist(a_hsd)
    keys = set(d_t) | set(d_h)
    tv = 0.5 * sum(abs(d_t.get(k, 0) - d_h.get(k, 0)) for k in keys)
    # both verifiers are lossless => same output law; TV between two
    # 100-sample draws of an ~11-category distribution concentrates well
    # below this bound, while a genuinely different law (e.g. greedy
    # degenerate output) trips it
    assert tv < 0.25, (tv, d_t, d_h)
    # the digit channel must be non-degenerate (the parity is about real
    # distributions, not None == None)
    assert sum(v for k, v in d_t.items() if k is not None) > 0.5

    # counts channel flowed through the real artifact path, and the
    # expected qualitative BE ordering holds on the same runs
    assert s_tok["block_efficiency"] >= 1.0
    assert s_hsd["block_efficiency"] > s_tok["block_efficiency"] - 0.5
