"""Compute ops: linear/quantized matmul, sampling, attention kernels."""
from .linear import QuantizedLinear, apply_linear, dequantize, quantize

__all__ = ["QuantizedLinear", "apply_linear", "dequantize", "quantize"]
