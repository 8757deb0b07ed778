"""Training data pipeline tests (train/data.py): conversation jsonl ->
(input_ids, loss_mask) with exact assistant-span masks, fixed-bucket
collation, noise augmentation, and end-to-end consumption by the real
trainers through train_loop."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.eval.benches import ChatTemplate
from hsd_tpu.eval.gsm8k import ByteTokenizer
from hsd_tpu.train.data import (add_gaussian_noise, add_uniform_noise,
                                collate, collate_offline,
                                conversation_batches,
                                conversation_data_epochs, list_data_files,
                                load_sharegpt, offline_example, pick_bucket,
                                tokenize_conversation)


def _sharegpt_rows():
    return [
        {"id": "a", "conversations": [
            {"from": "human", "value": "What is two plus two?"},
            {"from": "gpt", "value": "Two plus two equals four."},
            {"from": "human", "value": "And times three?"},
            {"from": "gpt", "value": "Twelve."}]},
        {"id": "b", "conversations": [
            {"from": "gpt", "value": "stray leading reply"},   # dropped
            {"from": "human", "value": "Name a color."},
            {"from": "gpt", "value": "Blue."}]},
        {"id": "c", "conversations": [
            {"from": "human", "value": "only a question, no reply"}]},  # skip
        {"id": "d", "conversations": [
            {"from": "human", "value": "Hi"},
            {"from": "human", "value": "Hi again"}]},  # broken alternation
    ]


def _write(tmp_path, rows):
    p = tmp_path / "conv.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_load_sharegpt_filters(tmp_path):
    convs = load_sharegpt(_write(tmp_path, _sharegpt_rows()))
    assert len(convs) == 2            # rows c (no pair) and d (broken) gone
    for msgs in convs:
        assert msgs[0]["role"] == "system"
        roles = [m["role"] for m in msgs[1:]]
        assert roles == ["user", "assistant"] * (len(roles) // 2)


@pytest.mark.parametrize("style", ["qwen", "llama3", "plain"])
def test_mask_marks_exactly_assistant_spans(style):
    """Property: loss=1 positions decode to exactly the assistant contents
    (+ closing token), nothing from system/user/headers leaks in."""
    tok = ByteTokenizer()
    template = ChatTemplate(style=style)
    msgs = [{"role": "system", "content": "Be brief."},
            {"role": "user", "content": "Say hello."},
            {"role": "assistant", "content": "Hello there!"},
            {"role": "user", "content": "Now say goodbye."},
            {"role": "assistant", "content": "Goodbye!"}]
    ids, mask = tokenize_conversation(tok, msgs, template, max_len=4096)
    assert ids.shape == mask.shape and mask[-1] == 0.0
    trained = tok.decode(ids[mask > 0].tolist())
    assert "Hello there!" in trained and "Goodbye!" in trained
    # nothing outside assistant content (headers/user/system) trains
    for frag in ("Be brief", "Say hello", "Now say", "user", "system"):
        assert frag not in trained
    # the final assistant close-token is masked off only by the last-position
    # rule; the FIRST assistant reply's closing token does train
    if style == "qwen":
        assert "<|im_end|>" in trained
    if style == "llama3":
        assert "<|eot_id|>" in trained


class _BosAddingTokenizer(ByteTokenizer):
    """HF-style stub that auto-prepends a BOS id unless told not to — the
    Llama-3 tokenizer behavior that corrupted per-segment encoding (ADVICE
    r3: injected <|begin_of_text|> per segment, some marked loss=1)."""

    BOS = 255

    def encode(self, s: str, add_special_tokens: bool = True):
        base = super().encode(s)
        return ([self.BOS] + base) if add_special_tokens else base


def test_segmentwise_equals_whole_render_with_bos_tokenizer():
    """tokenize_conversation must disable special-token insertion per
    segment: the concatenated ids equal the whole-render tokenization (no
    specials), and no injected BOS appears inside assistant loss spans."""
    tok = _BosAddingTokenizer()
    msgs = [{"role": "user", "content": "Say hello."},
            {"role": "assistant", "content": "Hello there!"},
            {"role": "user", "content": "Again."},
            {"role": "assistant", "content": "Hello again!"}]
    for style in ("qwen", "llama3", "plain"):
        t = ChatTemplate(style=style)
        ids, mask = tokenize_conversation(tok, msgs, t, max_len=4096)
        from hsd_tpu.train.data import _segments
        whole = tok.encode("".join(s for s, _ in _segments(t, msgs)),
                           add_special_tokens=False)
        np.testing.assert_array_equal(ids, np.asarray(whole, np.int32)[:4096])
        assert tok.BOS not in ids[mask > 0]


def test_segments_match_full_render():
    """The structural segments concatenate to template.render minus the
    trailing open assistant header — the exactness claim behind the masks."""
    from hsd_tpu.train.data import _segments
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "U1"},
            {"role": "assistant", "content": "A1"},
            {"role": "user", "content": "U2"},
            {"role": "assistant", "content": "A2"}]
    for style, open_hdr in (("qwen", "<|im_start|>assistant\n"),
                            ("llama3", "<|start_header_id|>assistant"
                                       "<|end_header_id|>\n\n")):
        t = ChatTemplate(style=style)
        joined = "".join(s for s, _ in _segments(t, msgs))
        assert t.render(msgs) == joined + open_hdr


def test_truncation_and_bucketing():
    tok = ByteTokenizer()
    msgs = [{"role": "system", "content": "x" * 50},
            {"role": "user", "content": "y" * 200},
            {"role": "assistant", "content": "z" * 500}]
    ids, mask = tokenize_conversation(tok, msgs, max_len=128)
    assert len(ids) == 128 and mask[-1] == 0.0
    assert pick_bucket(100) == 256 and pick_bucket(257) == 512
    assert pick_bucket(99999) == 2048
    b_ids, b_mask = collate([(ids, mask), (ids[:50], mask[:50])], 256)
    assert b_ids.shape == (2, 256) and b_mask.shape == (2, 256)
    assert (b_mask[1, 50:] == 0).all() and (b_ids[1, 50:] == 0).all()
    # bucket-ladder clamp: a row whose assistant span lies entirely past the
    # largest bucket trains on nothing and must be SKIPPED, not emitted as an
    # all-zero-mask batch row
    long_msgs = [{"role": "system", "content": "s" * 300},
                 {"role": "user", "content": "u" * 300},
                 {"role": "assistant", "content": "a" * 20}]
    batches = list(conversation_batches([long_msgs], tok, batch_size=1,
                                        buckets=(256,), seed=0))
    assert batches == []


def test_conversation_batches_static_shapes(tmp_path):
    tok = ByteTokenizer()
    rows = []
    for i in range(7):
        rows.append({"id": i, "conversations": [
            {"from": "human", "value": "q" * (10 + 40 * i)},
            {"from": "gpt", "value": "a" * (10 + 60 * i)}]})
    convs = load_sharegpt(_write(tmp_path, rows))
    batches = list(conversation_batches(convs, tok, batch_size=2,
                                        buckets=(256, 512, 1024), seed=3))
    assert sum(b[0].shape[0] for b in batches) >= len(convs)
    for ids, mask in batches:
        assert ids.shape[0] == 2 and ids.shape[1] in (256, 512, 1024)
        assert mask.shape == ids.shape
        assert mask.sum() > 0


def test_epochs_reshuffle(tmp_path):
    tok = ByteTokenizer()
    rows = [{"id": i, "conversations": [
        {"from": "human", "value": f"question number {i} with padding"},
        {"from": "gpt", "value": f"answer number {i}"}]} for i in range(12)]
    de = conversation_data_epochs(_write(tmp_path, rows), tok, batch_size=3,
                                  buckets=(256,), seed=0, system="Sys.")
    e0 = [ids.tobytes() for ids, _ in de(0)]
    e0b = [ids.tobytes() for ids, _ in de(0)]
    e1 = [ids.tobytes() for ids, _ in de(1)]
    assert e0 == e0b               # deterministic per epoch
    assert e0 != e1                # reshuffled across epochs
    assert sorted(e0) != e0 or sorted(e1) != e1


def test_noise_augmentation_stats():
    h = jnp.zeros((2, 64, 32), jnp.float32)
    g = add_gaussian_noise(jax.random.PRNGKey(0), h, std=0.5, mean=0.1)
    assert abs(float(jnp.mean(g)) - 0.1) < 0.02
    assert abs(float(jnp.std(g)) - 0.5) < 0.02
    u = add_uniform_noise(jax.random.PRNGKey(1), h, std=0.2)
    # ref scaling: (U-0.5) * std * 512 / T with T = 64 -> range +-0.8
    assert float(jnp.max(jnp.abs(u))) <= 0.2 * 512 / 64 * 0.5 + 1e-6
    assert float(jnp.std(u)) > 0.1
    assert add_gaussian_noise(jax.random.PRNGKey(2), h) is h
    assert add_uniform_noise(jax.random.PRNGKey(2), h) is h


def test_offline_example_shift_contract():
    T, D = 10, 8
    rng = np.random.default_rng(0)
    data = {"hidden_state": rng.normal(size=(T, D)),
            "input_ids": np.arange(T) + 5,
            "loss_mask": np.ones((T,))}
    ex = offline_example(data, max_len=8)
    assert ex["input_ids"].shape == (8,)
    # ids shifted left by one, zero-padded
    np.testing.assert_array_equal(ex["input_ids"][:7], np.arange(6, 13))
    assert ex["input_ids"][7] == 0
    # target = hidden shifted left; hidden_state_big unshifted
    np.testing.assert_allclose(ex["target"][:7],
                               data["hidden_state"][1:8], rtol=1e-6)
    np.testing.assert_allclose(ex["hidden_state_big"],
                               data["hidden_state"][:8], rtol=1e-6)
    assert ex["loss_mask"][-1] == 0.0
    batch = collate_offline([ex, ex], bucket=16)
    assert batch["hidden_state_big"].shape == (2, 16, D)
    assert (batch["loss_mask"][:, 8:] == 0).all()


def test_list_data_files(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.jsonl").write_text("{}")
    (tmp_path / "sub" / "b.jsonl").write_text("{}")
    (tmp_path / "sub" / "c.txt").write_text("x")
    files = list_data_files(str(tmp_path), suffix=".jsonl")
    assert [f.rsplit("/", 1)[1] for f in files] == ["a.jsonl", "b.jsonl"]
    assert len(list_data_files(str(tmp_path))) == 3
    # i/n sharding convention
    assert list_data_files(str(tmp_path))[0::2] != files


def test_pipeline_feeds_trainers_unchanged(tmp_path):
    """End-to-end: conversation jsonl -> data_epochs -> train_loop with BOTH
    real train steps (eagle1 + eagle3) on a tiny model; losses finite and
    steps advance."""
    from hsd_tpu.config import ModelConfig
    from hsd_tpu.engine.eagle_engine import default_feature_layers
    from hsd_tpu.models import init_params
    from hsd_tpu.models.eagle import (EagleConfig, init_eagle_params,
                                      init_eagle_params_v1)
    from hsd_tpu.train.eagle1 import make_eagle1_train_step
    from hsd_tpu.train.eagle3 import (TrainConfig, init_train_state,
                                      make_train_step)
    from hsd_tpu.train.loop import train_loop

    cfg = ModelConfig.tiny(vocab_size=256, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=4,
                           num_kv_heads=2)
    cfg = __import__("dataclasses").replace(cfg, dtype=jnp.float32)
    params_t = init_params(cfg, jax.random.PRNGKey(0))
    rows = [{"id": i, "conversations": [
        {"from": "human", "value": f"ask {i}"},
        {"from": "gpt", "value": f"reply {i} ok"}]} for i in range(4)]
    de = conversation_data_epochs(_write(tmp_path, rows), ByteTokenizer(),
                                  batch_size=2, buckets=(256,), seed=0,
                                  system="Be brief.")
    tc = TrainConfig(steps=2, total_steps=10, warmup_steps=1)

    ecfg3 = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                        num_kv_heads=2, vocab_size=256, draft_vocab_size=256,
                        intermediate_size=64, dtype=jnp.float32,
                        rope_theta=10000.0)
    st3 = init_train_state(init_eagle_params(ecfg3, jax.random.PRNGKey(1)), tc)
    step3 = make_train_step(cfg, ecfg3, tc, default_feature_layers(cfg))
    st3 = train_loop(st3, step3, params_t, de, num_epochs=1)
    assert int(st3.step) == 2

    ecfg1 = __import__("dataclasses").replace(ecfg3, version=1)
    st1 = init_train_state(
        init_eagle_params_v1(ecfg1, jax.random.PRNGKey(2)), tc)
    step1 = make_eagle1_train_step(cfg, ecfg1, tc)
    st1 = train_loop(st1, step1, params_t, de, num_epochs=1)
    assert int(st1.step) == 2
