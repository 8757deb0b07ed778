"""UAD (different-tokenizer) tests with toy tokenizers."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine.uad import UadDrafter, align_suffix, make_uad_generate
from hsd_tpu.models import init_params


class CharTok:
    """Target tokenizer: 1 char per token (ids = bytes)."""
    def decode(self, ids):
        return "".join(chr((int(i) % 26) + 97) for i in ids)
    def encode(self, s):
        return [ord(c) - 97 for c in s if "a" <= c <= "z"]


def test_align_suffix():
    assert align_suffix([1, 2, 3], [1, 2, 4]) == 2
    assert align_suffix([1], [2]) == 0
    assert align_suffix([1, 2], [1, 2, 9]) == 2


def test_uad_drafter_propose():
    tok = CharTok()
    drafter = UadDrafter(tok, tok, lambda text, n: "abc"[:n], chars_per_token=1)
    prop = drafter.propose(tok.encode("hello"), gamma=3)
    assert prop == tok.encode("abc")


def test_uad_generate_runs():
    cfg = ModelConfig.tiny(vocab_size=26, eos_token_id=25)
    pt = init_params(cfg, jax.random.PRNGKey(1))
    tok = CharTok()
    # draft continuation: repeat the last 3 chars (context-derived proposals)
    drafter = UadDrafter(tok, tok, lambda text, n: text[-3:][:n],
                         chars_per_token=1)
    eng = EngineConfig(verifier=VerifierConfig(method="tokenwise", gamma=3),
                      max_new_tokens=10)
    gen = make_uad_generate(cfg, eng, drafter)
    out = gen(pt, tok.encode("abcabd"), jax.random.PRNGKey(2))
    assert 1 <= len(out) <= 10
    assert all(0 <= t < 26 for t in out)
