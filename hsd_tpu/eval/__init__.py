"""Evaluation harnesses and metrics (GSM8K, BE/DS/accuracy)."""
from .metrics import (accuracy, block_efficiency, decoding_speed,
                      extract_answer, summarize, test_answer)

__all__ = ["accuracy", "block_efficiency", "decoding_speed", "extract_answer",
           "summarize", "test_answer"]
