"""Streaming generate parity: the concatenated stream chunks must form a
valid generation (same engine math as make_generate)."""
import jax
import jax.numpy as jnp
import numpy as np

from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
from hsd_tpu.engine.streaming import make_stream_generate
from hsd_tpu.models import init_params


def test_stream_generate_chunks():
    cfg = ModelConfig.tiny(vocab_size=64)
    pd = init_params(cfg, jax.random.PRNGKey(0))
    pt = init_params(cfg, jax.random.PRNGKey(1))
    eng = EngineConfig(verifier=VerifierConfig(method="hsd", gamma=3),
                      max_new_tokens=12)
    stream = make_stream_generate(cfg, cfg, eng)
    prompt = (jnp.arange(8, dtype=jnp.int32) % 50) + 1
    chunks = list(stream(pd, pt, prompt, jnp.int32(8), jax.random.PRNGKey(2)))
    assert len(chunks) >= 1
    out = np.concatenate(chunks)
    assert 1 <= len(out) <= 12
    assert ((out >= 0) & (out < 64)).all()
    # chunk sizes within gamma+1
    assert all(1 <= len(c) <= 4 for c in chunks)
