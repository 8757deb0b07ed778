"""Decode orchestration: KV cache, speculative + autoregressive + EAGLE loops."""
from .kvcache import (KVCache, compact_path, init_cache, rollback,
                      select_draft_row)
from .speculative import (GenerateResult, make_autoregressive, make_generate,
                          make_generate_batched)
from .stepwise import make_recursive_generate, make_stepwise_generate
from .eagle_engine import (EagleGenerateResult, make_eagle_block,
                           make_eagle_generate, make_eagle_pool)
from .eagle_server import EagleSlotEngine

__all__ = ["KVCache", "compact_path", "init_cache", "rollback",
           "select_draft_row", "GenerateResult", "make_autoregressive",
           "make_generate", "make_generate_batched", "EagleGenerateResult",
           "make_eagle_generate", "make_stepwise_generate",
           "make_recursive_generate"]
