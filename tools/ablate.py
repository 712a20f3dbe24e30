#!/usr/bin/env python
"""Decode-throughput ablation: times the REAL engine loop across model
variants to attribute per-token cost (microbenchmarks of isolated jits
mismeasure on this platform; the engine's own step graph is the only
trustworthy clock).

Variants vs the 7B baseline:
  - tiny-vocab: vocab 2048  -> isolates lm_head GEMV + sampling cost
  - half-layers: 16 layers  -> separates per-layer cost from fixed/step
  - short-ctx: max_seq 136  -> isolates attention-window cost
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(name, cfg, max_seq, steps, repeats, chunk, impl):
    import jax
    import jax.numpy as jnp

    from llama_cu_awq_tpu.engine import InferenceEngine
    from llama_cu_awq_tpu.models import synthetic_params

    params = synthetic_params(cfg, seed=0, tpu_layout=True)
    jax.block_until_ready(params.embed)
    eng = InferenceEngine(params, cfg, act_dtype=jnp.bfloat16,
                          matmul_impl=impl, max_seq=max_seq,
                          temperature=0.0, chunk_size=chunk)
    prompt = list(range(5, 13))
    steps = min(steps, max_seq - 2)
    eng.generate_benchmark(prompt, steps)  # warmup/compile
    best = 0.0
    for _ in range(repeats):
        _, dt, tok_s = eng.generate_benchmark(prompt, steps)
        best = max(best, tok_s)
    us_per_tok = 1e6 / best
    print(f"{name:14s} {best:8.2f} tok/s   {us_per_tok:8.1f} us/tok",
          flush=True)
    del params, eng
    return us_per_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--only", default=None,
                    help="comma list of variant names to run")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/llama_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from llama_cu_awq_tpu.config import LLAMA2_7B

    base = LLAMA2_7B
    variants = {
        "full": (base, 512),
        "tiny-vocab": (dataclasses.replace(base, vocab_size=2048), 512),
        "half-layers": (dataclasses.replace(base, n_layers=16), 512),
        "short-ctx": (base, 136),
        "ctx128": (base, 128),   # single 128 attention bucket
        "full126": (base, 512),  # full model, same 126 steps as ctx128
    }
    results = {}
    for name, (cfg, max_seq) in variants.items():
        if args.only and name not in args.only.split(","):
            continue
        steps = 126 if name in ("ctx128", "full126") else args.steps
        results[name] = run(name, cfg, max_seq, steps, args.repeats,
                            args.chunk, args.impl)

    if "full" in results:
        full = results["full"]
        attribution = {}
        if "tiny-vocab" in results:
            attribution["lm_head+embed_us"] = full - results["tiny-vocab"]
        if "half-layers" in results:
            attribution["per_16_layers_us"] = full - results["half-layers"]
            attribution["fixed_per_step_us"] = \
                full - 2 * (full - results["half-layers"])
        if "short-ctx" in results:
            attribution["attention_window_us"] = full - results["short-ctx"]
        print(json.dumps(attribution))


if __name__ == "__main__":
    main()
