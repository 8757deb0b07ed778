"""GSM8K prompt-library generator tests (SURVEY §2.2 G5).

Pins: all 27 reference-named variant files + 2 index npys exist and
regenerate deterministically; exemplar arithmetic is self-consistent; the
step-count files honor their names; format transforms hold; the harness
resolves variants by stem.
"""
import os
import re

import numpy as np
import pytest

from hsd_tpu.eval.gsm8k import default_prompt_path
from hsd_tpu.eval.prompt_library import build_library, build_pool, render

LIB = os.path.join(os.path.dirname(default_prompt_path()), "")

REF_NAMES = [
    "prompt_4_9step_4_8step.txt", "prompt_6_9step.txt", "prompt_7x8step.txt",
    "prompt_8_9step_2_8step.txt", "prompt_8x8step.txt", "prompt_9x8step.txt",
    "prompt_easy.txt", "prompt_exclamation.txt", "prompt_explicit.txt",
    "prompt_hard.txt", "prompt_hardest.txt", "prompt_long_questions.txt",
    "prompt_long_step_short_sent.txt", "prompt_longest.txt", "prompt_mid.txt",
    "prompt_mid_length_questions.txt", "prompt_no_break.txt",
    "prompt_original.txt", "prompt_random.txt", "prompt_semicolon.txt",
    "prompt_short_questions.txt", "prompt_simple_4_cases.txt",
    "prompt_simple_4_cases_ao.txt", "prompt_simple_exclamation.txt",
    "prompt_simple_explicit.txt", "prompt_simple_no_break.txt",
    "prompt_simple_semicolon.txt", "random_index.npy",
    "validation_index.npy",
]


def test_full_library_shipped():
    """Every file the reference ships (by name) exists in our lib_prompt."""
    for name in REF_NAMES:
        assert os.path.exists(os.path.join(LIB, name)), name


def test_regeneration_deterministic(tmp_path):
    names = build_library(str(tmp_path))
    assert len(names) == 28  # 26 generated prompts + 2 npys (original is
    #                          hand-written and not regenerated)
    for n in ("prompt_hardest.txt", "prompt_semicolon.txt"):
        a = open(tmp_path / n).read()
        b = open(os.path.join(LIB, n)).read()
        assert a == b, f"{n} drifted from the generator output"


def test_pool_arithmetic_and_shapes():
    pool = build_pool()
    assert len(pool) >= 24
    n9 = sum(1 for e in pool.values() if e.n_steps == 9)
    n8 = sum(1 for e in pool.values() if e.n_steps == 8)
    assert n9 >= 8 and n8 >= 8, (n9, n8)
    for name, ex in pool.items():
        assert ex.answer > 0
        # the final step must state the numeric answer
        assert str(ex.answer) in ex.steps[-1], name


def _parse(path):
    txt = open(path).read()
    blocks = [b for b in txt.split("\nQuestion: ") if b.strip()]
    out = []
    for b in blocks:
        m = re.search(r"The answer is (\d+)", b)
        assert m, b[:80]
        out.append((b, int(m.group(1))))
    return out


@pytest.mark.parametrize("name,shots,steps", [
    ("prompt_hardest.txt", 8, 9),
    ("prompt_8x8step.txt", 8, 8),
    ("prompt_9x8step.txt", 9, 8),
    ("prompt_7x8step.txt", 7, 8),
    ("prompt_6_9step.txt", 6, 9),
])
def test_step_count_files(name, shots, steps):
    blocks = _parse(os.path.join(LIB, name))
    assert len(blocks) == shots, name
    for b, _ in blocks:
        body = b.split("Let's think step by step\n", 1)[1]
        lines = [l for l in body.split("\n")
                 if l.strip() and not l.startswith("The answer is")
                 and not l.startswith("Question:")]
        assert len(lines) == steps, (name, len(lines))


def test_format_transforms():
    pool = build_pool()
    ex = pool["shop1"]
    assert "Step 1:" in render(ex, "explicit")
    assert "!" in render(ex, "exclamation")
    assert "; " in render(ex, "semicolon")
    nb = render(ex, "no_break")
    assert "Let's think step by step\n" in nb
    assert nb.split("Let's think step by step\n", 1)[1].count("\n") == 2
    ao = render(ex, "ao")
    assert "step by step" not in ao and f"The answer is {ex.answer}" in ao


def test_index_files():
    val = np.load(os.path.join(LIB, "validation_index.npy"))
    rnd = np.load(os.path.join(LIB, "random_index.npy"))
    assert val.shape == (200,) and rnd.shape == (8,)
    assert len(set(val.tolist())) == 200
    assert val.min() >= 0 and val.max() < 7473  # GSM8K train size


def test_harness_resolves_variants():
    p = default_prompt_path("hardest")
    assert p.endswith("prompt_hardest.txt") and os.path.exists(p)
    with pytest.raises(FileNotFoundError) as e:
        default_prompt_path("nope")
    assert "have" in str(e.value)
