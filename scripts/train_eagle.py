#!/usr/bin/env python
"""EAGLE draft-head training CLI — the launcher-main counterpart of the
reference's `accelerate launch main.py` / `deepspeed main.py`
(EAGLE-3H/eagle/train/main.py, traineagle3/main.py) collapsed into one SPMD
program: conversation jsonl -> train/data.py pipeline -> eagle1/eagle3 train
step over a (data, model) mesh -> orbax checkpoints with auto-resume.

Examples:
  # EAGLE-3 head on a ShareGPT jsonl, tiny smoke geometry (CI)
  python scripts/train_eagle.py --data conv.jsonl --geometry tiny \
      --epochs 1 --batch-size 2
  # EAGLE-1 legacy head, 8B target from a checkpoint dir, dp=4 x tp=2 mesh
  python scripts/train_eagle.py --version 1 --data conv.jsonl \
      --target-path /ckpts/llama3-8b --dp 4 --tp 2 --ckpt-dir ckpts/eagle1

Without --target-path, random weights of --geometry run the whole pipeline
(the loss is meaningless but every stage is real — the CI smoke).
"""
import argparse
import dataclasses
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="ShareGPT-style conversations jsonl/json "
                         "(required unless --features-dir)")
    ap.add_argument("--version", type=int, default=3, choices=[1, 3])
    ap.add_argument("--target-path", default=None)
    ap.add_argument("--geometry", default="tiny")
    ap.add_argument("--eagle-config", default=None,
                    help="EConfig JSON (EagleConfig.from_json)")
    ap.add_argument("--template", default="qwen",
                    choices=["qwen", "llama3", "plain"])
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--buckets", default="256,512,1024,2048")
    ap.add_argument("--system", default=None,
                    help="system prompt override (default: the reference's "
                         "training system prompt; shorten for byte-tokenizer "
                         "smokes with small buckets)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--save-every-epochs", type=int, default=1)
    ap.add_argument("--log-jsonl", default=None)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--kacc-probe", action="store_true",
                    help="between-epoch getkacc rollout probe (ref "
                         "train/main.py:420-424)")
    ap.add_argument("--steps-per-epoch", type=int, default=0,
                    help="0 = full epoch; >0 truncates (smoke runs)")
    ap.add_argument("--dump-features", default=None, metavar="DIR",
                    help="run the target ONCE over the data, write feature "
                         "shards to DIR (ref CustomDataset pre-dump, "
                         "train/main.py:133-172), then exit")
    ap.add_argument("--features-dir", default=None, metavar="DIR",
                    help="train FROM a feature dump: no target forward in "
                         "the step (--data is ignored)")
    args = ap.parse_args()

    from hsd_tpu.config import ModelConfig
    from hsd_tpu.engine.eagle_engine import default_feature_layers
    from hsd_tpu.eval.benches import ChatTemplate
    from hsd_tpu.eval.gsm8k import ByteTokenizer
    from hsd_tpu.models import init_params
    from hsd_tpu.models.eagle import (EagleConfig, init_eagle_params,
                                      init_eagle_params_v1)
    from hsd_tpu.train.data import conversation_data_epochs
    from hsd_tpu.train.eagle1 import make_eagle1_train_step
    from hsd_tpu.train.eagle3 import (TrainConfig, init_train_state,
                                      make_train_step)
    from hsd_tpu.train.loop import train_loop
    from hsd_tpu.utils.logging import MetricLogger

    if args.target_path:
        from hsd_tpu.models.loader import load_hf
        cfg_t, params_t = load_hf(args.target_path)
    else:
        cfg_t = getattr(ModelConfig, args.geometry)()
        if args.geometry == "tiny":
            cfg_t = dataclasses.replace(cfg_t, dtype=jnp.float32)
        params_t = init_params(cfg_t, jax.random.PRNGKey(0))

    if args.eagle_config:
        ecfg = EagleConfig.from_json(args.eagle_config, version=args.version)
    else:
        ecfg = EagleConfig(
            hidden_size=cfg_t.hidden_size,
            target_hidden_size=cfg_t.hidden_size,
            num_heads=cfg_t.num_heads, num_kv_heads=cfg_t.num_kv_heads,
            vocab_size=cfg_t.vocab_size, draft_vocab_size=cfg_t.vocab_size,
            intermediate_size=cfg_t.intermediate_size,
            rope_theta=cfg_t.rope_theta, dtype=cfg_t.dtype,
            version=args.version)

    if args.tokenizer_path:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer_path)
    else:
        tok = ByteTokenizer()

    if args.features_dir:
        from hsd_tpu.train.features import offline_data_epochs, offline_meta
        meta = offline_meta(args.features_dir)
        assert meta["version"] == args.version, (
            f"feature dump is version {meta['version']}, "
            f"requested --version {args.version}")
        de = offline_data_epochs(args.features_dir)
    else:
        assert args.data, "--data required unless --features-dir"
        buckets = tuple(int(b) for b in args.buckets.split(","))
        kw = {"system": args.system} if args.system is not None else {}
        de_full = conversation_data_epochs(
            args.data, tok, args.batch_size,
            ChatTemplate(style=args.template),
            max_len=args.max_len, buckets=buckets, **kw)
        if args.steps_per_epoch:
            import itertools
            de = lambda e: itertools.islice(de_full(e), args.steps_per_epoch)
        else:
            de = de_full

    if args.dump_features:
        from hsd_tpu.train.features import dump_features
        fl = (default_feature_layers(cfg_t) if args.version == 3 else None)
        n = dump_features(cfg_t, params_t, de(0), args.dump_features,
                          feature_layers=fl, version=args.version)
        print(json.dumps({"dumped_shards": n, "dir": args.dump_features,
                          "version": args.version}))
        return

    # steps estimate for the warmup/decay schedule (first epoch's count)
    n_batches = sum(1 for _ in de(0))
    assert n_batches, "data pipeline produced no batches"
    total = n_batches * args.epochs
    tc = TrainConfig(total_steps=total, warmup_steps=max(1, total // 20),
                     **({"lr": args.lr} if args.lr else {}))

    if args.dp * args.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hsd_tpu.parallel import make_mesh, shard_params
        mesh = make_mesh(data=args.dp, model=args.tp)
        jax.set_mesh(mesh)
        params_t = shard_params(params_t, mesh)

    key = jax.random.PRNGKey(1)
    if args.version == 1:
        params_e = init_eagle_params_v1(ecfg, key)
        if args.features_dir:
            from hsd_tpu.train.eagle1 import make_eagle1_train_step_offline
            step = make_eagle1_train_step_offline(cfg_t, ecfg, tc)
        else:
            step = make_eagle1_train_step(cfg_t, ecfg, tc)
    else:
        params_e = init_eagle_params(ecfg, key)
        if args.features_dir:
            from hsd_tpu.train.eagle3 import make_train_step_offline
            step = make_train_step_offline(cfg_t, ecfg, tc)
        else:
            step = make_train_step(cfg_t, ecfg, tc,
                                   default_feature_layers(cfg_t))
    state = init_train_state(params_e, tc)

    probe = None
    if args.kacc_probe:
        from hsd_tpu.train.probes import make_kacc_probe
        probe = make_kacc_probe(cfg_t, ecfg)

    logger = MetricLogger(args.log_jsonl) if args.log_jsonl else None
    state = train_loop(state, step, params_t, de, args.epochs,
                       ckpt_dir=args.ckpt_dir,
                       save_every_epochs=args.save_every_epochs,
                       logger=logger, log_every=args.log_every,
                       epoch_probe=probe)
    print(json.dumps({"final_step": int(state.step),
                      "epochs": args.epochs, "batches_per_epoch": n_batches,
                      "ckpt_dir": args.ckpt_dir}))


if __name__ == "__main__":
    main()
