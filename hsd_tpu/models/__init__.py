"""Model stack: unified Qwen2/Llama decoder, EAGLE-3 head, weight loading."""
from . import transformer
from .transformer import ModelParams, forward, init_params

__all__ = ["transformer", "ModelParams", "forward", "init_params"]
