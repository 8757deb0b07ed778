"""Evaluation harnesses and metrics (GSM8K, multi-bench, BE/DS/accuracy)."""
from .benches import (ChatTemplate, get_system_prompt, load_bench_questions,
                      reorg_answer_file, run_multibench)
from .metrics import (accuracy, block_efficiency, decoding_speed,
                      extract_answer, summarize, test_answer)

__all__ = ["accuracy", "block_efficiency", "decoding_speed", "extract_answer",
           "summarize", "test_answer", "ChatTemplate", "get_system_prompt",
           "load_bench_questions", "reorg_answer_file", "run_multibench"]
