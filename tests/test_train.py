"""EAGLE-3 head training tests: loss decreases, checkpoint round-trip,
data-parallel step on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsd_tpu.config import ModelConfig
from hsd_tpu.engine.eagle_engine import default_feature_layers
from hsd_tpu.models import init_params
from hsd_tpu.models.eagle import EagleConfig, init_eagle_params
from hsd_tpu.train.eagle3 import (TrainConfig, init_train_state,
                                  latest_checkpoint_step, make_train_step,
                                  restore_checkpoint, save_checkpoint)

TCFG = ModelConfig.tiny(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=4, num_heads=4, num_kv_heads=2)
ECFG = EagleConfig(hidden_size=32, target_hidden_size=32, num_heads=4,
                   num_kv_heads=2, vocab_size=64, draft_vocab_size=64,
                   intermediate_size=64, dtype=jnp.float32,
                   rope_theta=10000.0)
TC = TrainConfig(steps=3, lr=2e-3, warmup_steps=2, total_steps=50)


def _setup():
    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    state = init_train_state(pe, TC)
    step = make_train_step(TCFG, ECFG, TC, default_feature_layers(TCFG))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 64)
    lm = jnp.ones((2, 16), jnp.float32)
    return pt, state, step, ids.astype(jnp.int32), lm


def test_loss_decreases():
    pt, state, step, ids, lm = _setup()
    losses = []
    for _ in range(8):
        state, metrics = step(state, pt, ids, lm)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_frozen_buffers_untouched():
    pt, state, step, ids, lm = _setup()
    emb0 = np.asarray(state.params.embed)
    state, _ = step(state, pt, ids, lm)
    np.testing.assert_array_equal(np.asarray(state.params.embed), emb0)


def test_checkpoint_roundtrip(tmp_path):
    pt, state, step, ids, lm = _setup()
    state, _ = step(state, pt, ids, lm)
    save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint_step(str(tmp_path)) == 1
    restored = restore_checkpoint(str(tmp_path), 1, state)
    np.testing.assert_allclose(np.asarray(restored.params.fc),
                               np.asarray(state.params.fc))
    assert int(restored.step) == 1


def test_data_parallel_step_matches_single():
    """Batch sharded over the `data` axis must produce the same update."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hsd_tpu.parallel import make_mesh

    pt, state, step, ids, lm = _setup()
    s1, m1 = step(state, pt, ids, lm)

    mesh = make_mesh(data=2, model=1)
    with jax.set_mesh(mesh):
        sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
        sharded_lm = jax.device_put(lm, NamedSharding(mesh, P("data", None)))
        s2, m2 = step(state, pt, sharded_ids, sharded_lm)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params.fc),
                               np.asarray(s2.params.fc), rtol=1e-4, atol=1e-5)


def test_zero_sharded_step_matches_replicated():
    """ZeRO-equivalent optimizer-state sharding (SURVEY §2.5, ref DeepSpeed
    ZeRO-2): the train step with Adam moments sharded over `data` must
    produce the same params/loss as the replicated step, and the moments
    must actually live sharded across devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hsd_tpu.parallel import make_mesh
    from hsd_tpu.train.eagle3 import zero_opt_shardings

    pt, state, step, ids, lm = _setup()
    ids = jnp.concatenate([ids, ids], 0)        # B=4 to shard over data=4
    lm = jnp.concatenate([lm, lm], 0)
    s1, m1 = step(state, pt, ids, lm)

    mesh = make_mesh(data=4, model=1)
    with jax.set_mesh(mesh):
        zstate = init_train_state(state.params, TC, zero_mesh=mesh)
        zstep = make_train_step(TCFG, ECFG, TC, default_feature_layers(TCFG),
                                zero_mesh=mesh)
        sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
        sharded_lm = jax.device_put(lm, NamedSharding(mesh, P("data", None)))
        s2, m2 = zstep(zstate, pt, sharded_ids, sharded_lm)
        jax.block_until_ready(s2.params.fc)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params.fc),
                               np.asarray(s2.params.fc), rtol=1e-4, atol=1e-5)
    # the Adam mu leaf for fc is genuinely sharded (not replicated): its
    # per-device shard covers 1/4 of the rows
    mu_fc = s2.opt_state[1][0].mu["fc"]
    shard_shapes = {s.data.shape for s in mu_fc.addressable_shards}
    full = mu_fc.shape
    assert any(np.prod(sh) == np.prod(full) // 4 for sh in shard_shapes), (
        shard_shapes, full)
    # second step keeps the sharded layout (constraint on the incoming state)
    s3, _ = zstep(s2, pt, sharded_ids, sharded_lm)
    mu_fc3 = s3.opt_state[1][0].mu["fc"]
    assert {s.data.shape for s in mu_fc3.addressable_shards} == shard_shapes


def test_eagle1_zero_sharded_step():
    """eagle1 trainer accepts zero_mesh and trains with sharded moments."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hsd_tpu.parallel import make_mesh
    from hsd_tpu.train.eagle1 import make_eagle1_train_step

    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 64,
                             dtype=jnp.int32)
    lm = jnp.ones((2, 16), jnp.float32)
    base_step = make_eagle1_train_step(TCFG, ECFG, TC)
    s1, m1 = base_step(init_train_state(pe, TC), pt, ids, lm)
    mesh = make_mesh(data=2, model=1)
    with jax.set_mesh(mesh):
        zstep = make_eagle1_train_step(TCFG, ECFG, TC, zero_mesh=mesh)
        zstate = init_train_state(pe, TC, zero_mesh=mesh)
        s2, m2 = zstep(zstate, pt,
                       jax.device_put(ids, NamedSharding(mesh, P("data", None))),
                       jax.device_put(lm, NamedSharding(mesh, P("data", None))))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params.fc),
                               np.asarray(s2.params.fc), rtol=1e-4, atol=1e-5)


def test_offline_features_step_matches_online(tmp_path):
    """The CustomDataset mode (ref train/main.py:133-172): dumping target
    features+logits once and training from the dump must produce the SAME
    first-step update as the online step (identical shifting), modulo the
    f16 shard round-trip."""
    from hsd_tpu.engine.kvcache import init_cache
    from hsd_tpu.models import transformer
    from hsd_tpu.train.eagle3 import make_train_step_offline
    from hsd_tpu.train.features import dump_features, offline_data_epochs

    pt, state, step, ids, lm = _setup()
    s1, m1 = step(state, pt, ids, lm)

    d = str(tmp_path / "feats")
    n = dump_features(TCFG, pt, [(ids, lm)], d,
                      feature_layers=default_feature_layers(TCFG), version=3)
    assert n == 1
    batches = list(offline_data_epochs(d)(0))
    assert len(batches) == 1
    ostep = make_train_step_offline(TCFG, ECFG, TC)
    s2, m2 = ostep(state, None, **batches[0])
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(s1.params.fc),
                               np.asarray(s2.params.fc), rtol=2e-2, atol=1e-4)


def test_offline_features_eagle1_step(tmp_path):
    from hsd_tpu.train.eagle1 import (make_eagle1_train_step,
                                      make_eagle1_train_step_offline)
    from hsd_tpu.train.features import dump_features, offline_data_epochs

    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params(ECFG, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 64,
                             dtype=jnp.int32)
    lm = jnp.ones((2, 16), jnp.float32)
    s1, m1 = make_eagle1_train_step(TCFG, ECFG, TC)(
        init_train_state(pe, TC), pt, ids, lm)
    d = str(tmp_path / "feats1")
    dump_features(TCFG, pt, [(ids, lm)], d, version=1)
    batch = next(iter(offline_data_epochs(d)(0)))
    s2, m2 = make_eagle1_train_step_offline(TCFG, ECFG, TC)(
        init_train_state(pe, TC), None, **batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-3)


def test_train_eagle_cli_offline_roundtrip(tmp_path):
    """scripts/train_eagle.py --dump-features then --features-dir runs both
    head versions end-to-end without a target forward in the step."""
    import json as _json
    import subprocess
    import sys as _sys

    conv = tmp_path / "conv.jsonl"
    rows = []
    for i in range(4):
        rows.append({"id": i, "conversations": [
            {"from": "human", "value": f"question {i} about colors?"},
            {"from": "gpt", "value": f"answer {i}: blue and green."}]})
    conv.write_text("\n".join(_json.dumps(r) for r in rows))
    env = dict(__import__("os").environ,
               JAX_PLATFORMS="cpu")
    base = [_sys.executable, "scripts/train_eagle.py", "--geometry", "tiny",
            "--batch-size", "2", "--buckets", "256", "--system", "hi",
            "--epochs", "1"]
    for ver in ("3", "1"):
        fdir = str(tmp_path / f"fd{ver}")
        r = subprocess.run(base + ["--data", str(conv), "--version", ver,
                                   "--dump-features", fdir],
                           capture_output=True, text=True, env=env,
                           cwd="/root/repo", timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        out = _json.loads(r.stdout.strip().splitlines()[-1])
        assert out["dumped_shards"] >= 1
        r2 = subprocess.run(base + ["--version", ver,
                                    "--features-dir", fdir],
                            capture_output=True, text=True, env=env,
                            cwd="/root/repo", timeout=600)
        assert r2.returncode == 0, r2.stderr[-2000:]
        out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
        assert out2["final_step"] >= 1


def test_eagle1_loss_decreases():
    import dataclasses
    from hsd_tpu.models.eagle import init_eagle_params_v1
    from hsd_tpu.train.eagle1 import make_eagle1_train_step
    from hsd_tpu.train.eagle3 import init_train_state

    ecfg1 = dataclasses.replace(ECFG, version=1)
    pt = init_params(TCFG, jax.random.PRNGKey(0))
    pe = init_eagle_params_v1(ecfg1, jax.random.PRNGKey(1))
    state = init_train_state(pe, TC)
    step = make_eagle1_train_step(TCFG, ecfg1, TC)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 64).astype(jnp.int32)
    lm = jnp.ones((2, 16), jnp.float32)
    losses = []
    for _ in range(8):
        state, m = step(state, pt, ids, lm)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_train_loop_resume_and_logging(tmp_path):
    """Loop driver: runs epochs, writes JSONL metrics, checkpoints, and a
    second invocation auto-resumes without redoing consumed steps."""
    import json
    from hsd_tpu.train.loop import train_loop
    from hsd_tpu.utils.logging import MetricLogger

    pt, state, step, ids, lm = _setup()

    def data(epoch):
        return [(ids, lm)] * 3

    logger = MetricLogger(path=str(tmp_path / "metrics.jsonl"))
    out = train_loop(state, step, pt, data, num_epochs=2,
                     ckpt_dir=str(tmp_path / "ckpt"), logger=logger,
                     log_every=2)
    logger.close()
    assert int(out.step) == 6
    assert latest_checkpoint_step(str(tmp_path / "ckpt")) == 6
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows and all("loss" in r for r in rows)

    # resume: 2 more epochs on top -> replay-skips the first 6 batches
    out2 = train_loop(init_train_state(out.params, TC), step, pt, data,
                      num_epochs=4, ckpt_dir=str(tmp_path / "ckpt"))
    assert int(out2.step) == 12


def test_plot_summary(tmp_path):
    from hsd_tpu.eval.metrics import plot_summary
    s = {"tokenwise": {"block_efficiency": 5.9, "decoding_speed": 82.0},
         "hsd": {"block_efficiency": 6.3, "decoding_speed": 91.0}}
    p = plot_summary(s, str(tmp_path / "be.png"))
    assert p is None or (tmp_path / "be.png").exists()


def test_topk_metrics_in_trainers():
    """Both trainers report the reference's top{1,2,3} accuracy probes
    (main.py:345-379); top1 <= top2 <= top3 and top1 matches the existing
    argmax accuracy definition up to masking."""
    pt, state, step, ids, lm = _setup()
    state2, m3 = step(state, pt, ids, lm)
    for k in ("top1_acc", "top2_acc", "top3_acc"):
        assert k in m3, m3.keys()
    assert float(m3["top1_acc"]) <= float(m3["top2_acc"]) + 1e-6
    assert float(m3["top2_acc"]) <= float(m3["top3_acc"]) + 1e-6

    from hsd_tpu.train.eagle1 import make_eagle1_train_step
    step1 = make_eagle1_train_step(TCFG, ECFG, TC)
    state1 = init_train_state(init_eagle_params(ECFG, jax.random.PRNGKey(5)),
                              TC)
    _, m1 = step1(state1, pt, ids, lm)
    for k in ("top1_acc", "top2_acc", "top3_acc"):
        assert k in m1
    assert float(m1["top1_acc"]) <= float(m1["top3_acc"]) + 1e-6


def test_kacc_probe():
    """getkacc (ref main.py:241-292): k-step rollout accuracy. Pins the
    accounting invariants (bounds, k=0 consistency with chained-match MC) and
    that the probe runs for both head versions."""
    from hsd_tpu.train.probes import getkacc, make_kacc_probe
    pt, state, step, ids, lm = _setup()
    probe = make_kacc_probe(TCFG, ECFG, max_length=4, max_probes=6)
    m = probe(state.params, pt, ids, lm)
    ks = [m[f"kacc_{i}"] for i in range(4)]
    assert all(0.0 <= v <= 1.0 for v in ks), ks

    # v1 head path
    from hsd_tpu.models.eagle import init_eagle_params_v1
    import dataclasses
    ecfg1 = dataclasses.replace(ECFG, version=1)
    pe1 = init_eagle_params_v1(ecfg1, jax.random.PRNGKey(7))
    probe1 = make_kacc_probe(TCFG, ecfg1, max_length=3, max_probes=4)
    m1 = probe1(pe1, pt, ids, lm)
    assert all(0.0 <= m1[f"kacc_{i}"] <= 1.0 for i in range(3))


def test_kacc_chain_property():
    """The k-step chain accounting: a step's accuracy counts only rollouts
    whose earlier steps matched, and mismatches propagate as tested-wrong —
    so total_k is non-decreasing in the reference's loop; with uniform masks
    kacc values are chain products, hence non-increasing in expectation.
    Verify kacc_0 >= kacc_last on an untrained head (random rollouts)."""
    from hsd_tpu.train.probes import getkacc
    pt, state, step, ids, lm = _setup()
    from hsd_tpu.engine.kvcache import init_cache
    from hsd_tpu.models import transformer
    cache = init_cache(TCFG, 2, 16)
    _, _, feats = transformer.forward(
        TCFG, pt, ids, cache, feature_layers=default_feature_layers(TCFG))
    from hsd_tpu.ops.linear import apply_linear
    hidden = apply_linear(state.params.fc, feats.astype(ECFG.dtype))
    kacc = getkacc(ECFG, state.params, hidden, ids, lm, max_length=4,
                   max_probes=8)
    assert kacc.shape == (4,)
    assert (kacc >= 0).all() and (kacc <= 1).all()
    assert kacc[0] >= kacc[-1] - 1e-9


def test_train_loop_epoch_probe(tmp_path):
    """epoch_probe wiring: the between-epoch kacc evaluation (ref
    main.py:420-424) runs on probe_batches batches and logs eval/-prefixed
    mean metrics."""
    import json
    from hsd_tpu.train.loop import train_loop
    from hsd_tpu.train.probes import make_kacc_probe
    from hsd_tpu.utils.logging import MetricLogger

    pt, state, step, ids, lm = _setup()
    probe = make_kacc_probe(TCFG, ECFG, max_length=3, max_probes=4)

    def data(epoch):
        return [(ids, lm)] * 2

    logger = MetricLogger(path=str(tmp_path / "m.jsonl"))
    train_loop(state, step, pt, data, num_epochs=1, logger=logger,
               log_every=1, epoch_probe=probe, probe_batches=2)
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    eval_rows = [r for r in rows if any(k.startswith("eval/") for k in r)]
    assert eval_rows, rows
    r = eval_rows[-1]
    for i in range(3):
        assert f"eval/kacc_{i}" in r
        assert 0.0 <= r[f"eval/kacc_{i}"] <= 1.0
