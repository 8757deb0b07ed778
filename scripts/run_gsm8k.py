#!/usr/bin/env python
"""GSM8K speculative-decoding evaluation CLI.

The counterpart of the reference's `eval_speculative_decoding_llm.py` +
`eval_speculative_qwen*.sh` run matrix (SURVEY.md §2.2): drives a draft +
target pair through the speculative engine over a GSM8K slice and reports
accuracy / block efficiency / decoding speed, writing the same artifact
shapes.

Examples (the reference's four shipped configs):
  # tokenwise baseline
  python scripts/run_gsm8k.py --method tokenwise --gamma 10 ...
  # HSD clever (the headline config)
  python scripts/run_gsm8k.py --method hsd --gamma 10 ...
  # multidraft 11 parallel, tokenwise or HSD
  python scripts/run_gsm8k.py --method tokenwise --num-drafts 11 ...
  python scripts/run_gsm8k.py --method hsd --num-drafts 11 ...

Weights: --draft-path/--target-path are HF checkpoint dirs (safetensors;
GPTQ via --target-bits 8|4). Without paths, random weights of the given
geometry run the pipeline end-to-end (CI smoke).
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="GSM8K test.jsonl path")
    ap.add_argument("--prompt-file", default=None,
                    help="explicit few-shot CoT prompt text file (overrides "
                         "--prompt)")
    ap.add_argument("--prompt", default="original",
                    help="packaged prompt-library variant stem (hsd_tpu/eval/"
                         "lib_prompt/prompt_<NAME>.txt): original, hardest "
                         "(the reference harness default), easy/mid/hard, "
                         "semicolon/exclamation/explicit/no_break, "
                         "simple_4_cases[_ao], 8x8step/6_9step/..., "
                         "short/mid_length/long_questions, longest, random")
    ap.add_argument("--draft-path", default=None)
    ap.add_argument("--target-path", default=None)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--draft-geometry", default="qwen2_05b")
    ap.add_argument("--target-geometry", default="qwen2_15b")
    ap.add_argument("--target-bits", type=int, default=0,
                    help="8/4 for GPTQ target checkpoints")
    ap.add_argument("--method", default="hsd",
                    choices=["tokenwise", "blockwise", "hsd", "hsd_ref",
                             "greedy"])
    ap.add_argument("--gamma", type=int, default=10)
    ap.add_argument("--num-drafts", type=int, default=1)
    ap.add_argument("--striped", action="store_true",
                    help="striped-tree multidraft (default: parallel)")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--stride", type=int, default=5,
                    help="question stride (ref uses every 5th)")
    ap.add_argument("--out-dir", default="gsm8k_out")
    ap.add_argument("--tag", default="run")
    ap.add_argument("--shard", default=None,
                    help="i/n — evaluate the i-th of n question shards "
                         "(the reference fans out with Ray, "
                         "gen_ea_answer_llama3chat.py:233-263; here any "
                         "process launcher works: one process per shard)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel size (model mesh axis)")
    ap.add_argument("--tp-mode", default="gspmd",
                    choices=["gspmd", "shardmap"],
                    help="gspmd: shard_params + jit (quantized targets fall "
                         "back to the XLA matmul); shardmap: local Megatron "
                         "shards running the Pallas kernels with explicit "
                         "psums (parallel/tp.py; requires an untied head)")
    args = ap.parse_args()

    from hsd_tpu.config import EngineConfig, ModelConfig, VerifierConfig
    from hsd_tpu.eval.gsm8k import (ByteTokenizer, EvalConfig,
                                    load_gsm8k_jsonl, run_eval)
    from hsd_tpu.models import init_params
    from hsd_tpu.models.loader import config_from_hf, load_hf

    if args.target_path:
        cfg_t, params_t = load_hf(args.target_path,
                                  quantized=args.target_bits or None)
    else:
        cfg_t = getattr(ModelConfig, args.target_geometry)()
        params_t = init_params(cfg_t, jax.random.PRNGKey(1))
    if args.draft_path:
        cfg_d, params_d = load_hf(args.draft_path)
    else:
        cfg_d = getattr(ModelConfig, args.draft_geometry)(
            vocab_size=cfg_t.vocab_size)
        params_d = init_params(cfg_d, jax.random.PRNGKey(0))

    if cfg_d.vocab_size != cfg_t.vocab_size:
        # Qwen2.5 pairs ship mismatched vocab widths (0.5B: 151936 vs 14B+:
        # 152064); truncate both to the common min like the reference
        # (eval_speculative_decoding_llm.py:140-198)
        from hsd_tpu.models.loader import align_vocab
        cfg_d, params_d, cfg_t, params_t = align_vocab(
            cfg_d, params_d, cfg_t, params_t)

    target_forward = None
    if args.tp > 1:
        import dataclasses

        from hsd_tpu.parallel import make_mesh, replicate, shard_params
        mesh = make_mesh(data=1, model=args.tp)
        jax.set_mesh(mesh)
        params_d = replicate(params_d, mesh)
        if args.tp_mode == "shardmap":
            from hsd_tpu.parallel.tp import (make_tp_target_forward,
                                             shard_params_tp)
            target_forward = make_tp_target_forward(cfg_t, params_t)
            params_t = shard_params_tp(params_t, mesh)
        else:
            params_t = shard_params(params_t, mesh)
            if args.target_bits:
                # GSPMD cannot partition the Pallas custom call: a TP-sharded
                # quantized target must run the XLA path (the replicated
                # draft keeps the Pallas kernel via its own config)
                cfg_t = dataclasses.replace(cfg_t, gptq_path="xla")

    if args.tokenizer_path:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer_path)
    else:
        tok = ByteTokenizer()

    from hsd_tpu.eval.gsm8k import default_prompt_path
    prompt_file = args.prompt_file or default_prompt_path(args.prompt)
    shots = open(prompt_file).read()
    qs = load_gsm8k_jsonl(args.data, limit=args.limit or None,
                          stride=args.stride)
    if args.shard:
        i, nsh = map(int, args.shard.split("/"))
        qs = qs[i::nsh]

    ev = EvalConfig(
        engine=EngineConfig(
            verifier=VerifierConfig(method=args.method, gamma=args.gamma,
                                    num_drafts=args.num_drafts,
                                    parallel=not args.striped),
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature),
        out_dir=args.out_dir, tag=args.tag)
    summary = run_eval(cfg_d, cfg_t, params_d, params_t, tok, qs, shots, ev,
                       target_forward=target_forward)
    # raw model answers live in the answers artifact; keep the console
    # summary readable
    summary.pop("model_answers", None)
    print(json.dumps(summary, indent=2, default=str))


if __name__ == "__main__":
    main()
