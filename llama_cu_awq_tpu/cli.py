"""Command-line driver, flag-compatible with the reference engine
(llama2_q4.cu:604-720): positional checkpoint plus

  -n <int>    max number of steps, default = max_seq_len
  -i <string> input prompt
  -f <string> path to file containing input prompt (overrides -i)
  -t <float>  temperature, default 0.5
  -p <float>  top-p, default 0.6 (out-of-range values reset to 0.9)
  -s <int>    random seed, default time(NULL)
  -z <string> path to custom tokenizer (default: tokenizer.bin)
  -m <string> mode: generate|chat|perplexity (default generate)
  -y <string> system prompt for chat mode
  -q <string> dataset file for perplexity mode
"""

from __future__ import annotations

import argparse
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="llama-tpu",
        description="TPU-native INT4 AWQ Llama-2 inference engine",
        usage="%(prog)s <checkpoint> [options]  "
              "(example: %(prog)s model.bin -n 256 -i \"Write a poem\")")
    ap.add_argument("checkpoint", help="packed .bin model checkpoint")
    ap.add_argument("-n", dest="steps", type=int, default=0)
    ap.add_argument("-i", dest="prompt", default=None)
    ap.add_argument("-f", dest="prompt_file", default=None)
    ap.add_argument("-t", dest="temperature", type=float, default=0.5)
    ap.add_argument("-p", dest="topp", type=float, default=0.6)
    ap.add_argument("-s", dest="seed", type=int, default=0)
    ap.add_argument("-z", dest="tokenizer", default="tokenizer.bin")
    ap.add_argument("-m", dest="mode", default="generate",
                    choices=["generate", "chat", "perplexity"])
    ap.add_argument("-y", dest="system_prompt", default=None)
    ap.add_argument("-q", dest="dataset", default=None)
    # TPU-native extensions (not in the reference)
    ap.add_argument("--impl", dest="matmul_impl", default=None,
                    choices=["auto", "dequant", "pallas"],
                    help="quantized matmul implementation")
    ap.add_argument("--act-dtype", default="bfloat16",
                    choices=["bfloat16", "float16", "float32"])
    ap.add_argument("--max-seq", type=int, default=None,
                    help="cap the KV cache length below the model seq_len")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8-quantize the KV cache (halves its memory "
                         "and bandwidth; near-lossless)")
    ap.add_argument("--kv-bits", type=int, default=8, choices=[8, 4],
                    help="quantized-KV width: 8 (default) or 4 "
                         "(nibble-packed, quarter footprint; implies "
                         "--kv-quant)")
    ap.add_argument("--attn-impl", default=None,
                    choices=["auto", "einsum", "batched",
                             "batched_static", "fused_step"],
                    help="Pallas decode-attention kernel: batched "
                         "(serving shapes, int8-KV-native) or "
                         "fused_step (whole attention step - qkv "
                         "split, RoPE, KV quantize, attention - in "
                         "one kernel; auto picks it at deep windows)")
    ap.add_argument("--spec", default=None, choices=["ngram"],
                    help="speculative decoding: prompt-lookup n-gram "
                         "proposals verified in one teacher-forced "
                         "pass; output is bit-identical to plain "
                         "decode at any temperature (sampled verify "
                         "reuses the exact upcoming sampler coins)")
    ap.add_argument("--spec-k", type=int, default=7, metavar="K",
                    help="speculation depth: proposed tokens per verify "
                         "(default 7)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the run to DIR")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu); overrides the "
                         "site default")
    ap.add_argument("--tp", type=int, default=1, metavar="N",
                    help="tensor-parallel over N devices (Megatron-style "
                         "column/row sharding + psum over the ICI mesh)")
    ap.add_argument("--lm-head-8bit", dest="lm_head_bits",
                    action="store_const", const=8,
                    help="per-row int8 lm_head (halves the classifier "
                         "HBM read; near-lossless; not with --tp)")
    ap.add_argument("--lm-head-bits", dest="lm_head_bits", type=int,
                    default=None, choices=[8, 4],
                    help="quantize the lm_head (8: per-row int8, "
                         "4: w4-g128 via the int4 kernel; not with --tp)")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    # parameter validation/overrides (llama2_q4.cu:680-685)
    if args.seed <= 0:
        args.seed = int(time.time())
    if args.temperature < 0.0:
        args.temperature = 0.0
    if args.topp < 0.0 or args.topp > 1.0:
        args.topp = 0.9
    perplexity = args.mode == "perplexity"
    if not perplexity and args.dataset:
        print("Warning: dataset path is ignored in non-perplexity mode")

    prompt = args.prompt
    if args.prompt_file:
        if prompt:
            print("Warning: -f overrides -i")
        with open(args.prompt_file) as f:
            prompt = f.read()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from llama_cu_awq_tpu.engine import InferenceEngine
    from llama_cu_awq_tpu.engine.perplexity import dataset_perplexity
    from llama_cu_awq_tpu.io.checkpoint import load_checkpoint
    from llama_cu_awq_tpu.models import params_from_checkpoint
    from llama_cu_awq_tpu.tokenizer import Tokenizer

    ckpt = load_checkpoint(args.checkpoint, verbose=True)
    act_dtype = jnp.dtype(args.act_dtype)
    on_tpu = jax.devices()[0].platform == "tpu"
    # kernel (pair-planar) layout whenever the Pallas path may run
    tpu_layout = args.matmul_impl == "pallas" or (
        args.matmul_impl in (None, "auto") and on_tpu)
    param_dtype = None if args.act_dtype == "float16" else act_dtype
    mesh = None
    print("\nLoading Weights... ", end="", flush=True)
    if args.tp > 1:
        from llama_cu_awq_tpu.parallel import make_mesh, tp_params_from_checkpoint
        from llama_cu_awq_tpu.parallel.tp import place_params

        mesh = make_mesh(tp=args.tp, dp=1, devices=jax.devices()[:args.tp])
        params = place_params(
            tp_params_from_checkpoint(ckpt, args.tp,
                                      param_dtype=param_dtype or act_dtype),
            ckpt.config, mesh)
    else:
        params = params_from_checkpoint(ckpt, param_dtype=param_dtype,
                                        tpu_layout=tpu_layout)
        if args.lm_head_bits:
            from llama_cu_awq_tpu.models import quantize_lm_head

            params = quantize_lm_head(params, bits=args.lm_head_bits,
                                      tpu_layout=tpu_layout)
    if args.lm_head_bits and args.tp > 1:
        print("Warning: --lm-head-bits is ignored with --tp")
    print("done!")

    tokenizer = Tokenizer(args.tokenizer, ckpt.config.vocab_size)
    engine = InferenceEngine(
        params, ckpt.config, tokenizer, act_dtype=act_dtype,
        matmul_impl=args.matmul_impl, attn_impl=args.attn_impl,
        kv_quant=(4 if args.kv_bits == 4 else args.kv_quant),
        temperature=args.temperature,
        topp=args.topp, seed=args.seed, spec=args.spec,
        spec_k=args.spec_k,
        max_seq=args.max_seq or ckpt.config.seq_len, mesh=mesh)

    if args.profile:
        from llama_cu_awq_tpu.utils import profile_trace

        profile_cm = profile_trace(args.profile)
    else:
        import contextlib

        profile_cm = contextlib.nullcontext()

    with profile_cm:
        if perplexity:
            if not args.dataset:
                print("perplexity mode requires -q <dataset file>",
                      file=sys.stderr)
                return 1
            print("\nLoading Dataset...", end="", flush=True)
            with open(args.dataset, "rb") as f:
                text = f.read().decode("utf-8", errors="replace")
            print("done!")
            geo, count, _ = dataset_perplexity(engine, text, verbose=True)
            print(f"\nGeomean perplexity on {count} sequences: {geo:f}\n")
        elif args.mode == "generate":
            print("\nEncoding Prompt... Done!")

            def emit(piece):
                print(piece, end="", flush=True)

            _, stats = engine.generate(prompt or "", args.steps,
                                       on_piece=emit, echo=True)
            print(f"\n\nachieved tok/s: {stats['tok_per_s']:f}. "
                  f"Tokens: {stats['tokens']}, seconds: {stats['seconds']:g}")
            if engine.spec:
                ss = engine.spec_stats
                rate = (ss["accepted"] / ss["proposed"]
                        if ss["proposed"] else 0.0)
                print(f"spec: {ss['verifies']} verifies, "
                      f"{ss['accepted']}/{ss['proposed']} proposals "
                      f"accepted ({rate:.0%})")
        else:
            engine.chat_loop(prompt, args.system_prompt, args.steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
