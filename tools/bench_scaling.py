#!/usr/bin/env python
"""Scaling-efficiency benchmark: continuous-batching aggregate tok/s at
1 chip vs a tensor-sharded mesh (and, multi-process, dp over hosts).

BASELINE.json target: >=80% tokens/s scaling efficiency at 1 chip ->
1 host -> 2+ hosts (13B tensor-sharded, 32 concurrent requests).
Efficiency(N) = tok_s(N devices) / (N * tok_s(1 device)).

Single-host (run on a TPU host; measures tp=1 then tp=N over ICI):
    python tools/bench_scaling.py --config 13b --tps 1,4 --slots 32 \
        --kv-quant
Multi-host (one process per host; dp over DCN, tp over local ICI):
    python tools/bench_scaling.py --config 13b --tps 4 --slots 32 \
        --nprocs 2 --pid $I --coordinator host0:29400
    (each host runs its own BatchEngine dp-replica; aggregate tok/s is
    the per-host number summed by the coordinator print)
CPU smoke test (8 virtual devices, tiny model):
    python tools/bench_scaling.py --smoke

Prints one JSON line per measured point plus a final efficiency line.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_point(cfg, mesh, args, impl):
    """Aggregate tok/s for one engine configuration."""
    import jax.numpy as jnp

    from llama_cu_awq_tpu.engine.batch import BatchEngine
    from llama_cu_awq_tpu.models import synthetic_params
    from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

    if mesh is not None:
        from llama_cu_awq_tpu.parallel import tp_synthetic_params

        params = tp_synthetic_params(cfg, mesh, seed=0)
    else:
        import jax

        params = synthetic_params(
            cfg, seed=0, tpu_layout=jax.devices()[0].platform == "tpu")
    eng = BatchEngine(params, cfg, n_slots=args.slots, max_seq=args.max_seq,
                      act_dtype=jnp.bfloat16, matmul_impl=impl,
                      kv_quant=args.kv_quant, attn_impl=args.attn_impl,
                      temperature=0.0, chunk_size=args.chunk_size,
                      mesh=mesh)
    steps = min(args.steps, args.max_seq - 2 - args.prompt_len)
    prompts = [[BOS_TOKEN] + [5 + (i + j) % 500
                              for j in range(args.prompt_len - 1)]
               for i in range(args.requests)]

    def one_run():
        eng.reset()
        for p in prompts:
            eng.submit(p, max_new=steps)
        t0 = time.time()
        out = eng.run()
        dt = time.time() - t0
        return sum(len(v) for v in out.values()) / dt

    log("  warmup (compiles)...")
    one_run()
    best = max(one_run() for _ in range(args.repeats))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b", choices=["7b", "13b", "13b-mini", "tiny"])
    ap.add_argument("--tps", default="1",
                    help="comma-separated tensor-parallel widths, e.g. 1,4,8")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--prompt-len", type=int, default=8)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--chunk-size", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--kv-quant", action="store_true")
    ap.add_argument("--attn-impl", default=None,
                    choices=["batched", "fused_step"])
    ap.add_argument("--nprocs", type=int, default=1,
                    help="multi-host: process count (one per host)")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: host0:port of process 0")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model on 8 virtual CPU devices")
    ap.add_argument("--virtual", action="store_true",
                    help="1->2->4->8 sweep on 8 VIRTUAL CPU devices with "
                         "a 13B-proportioned mini model — exercises the "
                         "full tp sharding/collective path and records "
                         "the efficiency curve the real-hardware "
                         "invocation (--config 13b --tps 1,4,8) would "
                         "produce. NOT hardware numbers: all virtual "
                         "devices share one CPU's cycles, so 'efficiency' "
                         "here measures sharding overhead, not speedup.")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        args.config = "tiny"
        args.tps, args.slots, args.requests = "1,2", 4, 8
        args.steps, args.max_seq, args.repeats = 16, 64, 1
        args.chunk_size = 4
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        args.config = "13b-mini"
        args.tps = args.tps if args.tps != "1" else "1,2,4,8"
        args.slots, args.requests = 8, 16
        args.steps, args.max_seq = 32, 256
        args.chunk_size = 8
    if args.nprocs > 1:
        from llama_cu_awq_tpu.parallel import init_multihost

        init_multihost(coordinator_address=args.coordinator,
                       num_processes=args.nprocs, process_id=args.pid)

    jax.config.update("jax_compilation_cache_dir", "/tmp/llama_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from llama_cu_awq_tpu.config import LLAMA2_7B, LLAMA2_13B, ModelConfig
    from llama_cu_awq_tpu.parallel import make_mesh

    if args.config == "7b":
        cfg = LLAMA2_7B
    elif args.config == "13b":
        cfg = LLAMA2_13B
    elif args.config == "13b-mini":
        # 13B proportions (hidden/dim ~2.75, MHA like 13B) scaled to CPU
        # size with 8 heads of head_dim 128, so the tp=8 shard path is
        # exercised within the per-shard kv_dim >= 128 layout constraint
        cfg = ModelConfig(dim=1024, hidden_dim=2816, n_layers=2, n_heads=8,
                          n_kv_heads=8, vocab_size=2048, seq_len=512)
    else:
        cfg = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=2,
                          n_kv_heads=2, vocab_size=512, seq_len=512)
    impl = ("pallas" if jax.devices()[0].platform == "tpu" else "dequant")
    if impl == "dequant":
        # virtual-mesh runs measure SHARDING overhead, not kernels —
        # keep the interpret-mode Pallas prefill kernel out of the
        # timing (it engages on head_dim-128 configs since the r5 TP
        # guard lift and is orders slower interpreted than the XLA
        # einsum it replaces on real hardware)
        os.environ.setdefault("LLAMA_TPU_PREFILL_ATTN", "einsum")

    results = {}
    for tp in [int(t) for t in args.tps.split(",")]:
        n_local = jax.local_device_count()
        if tp > n_local:
            log(f"skipping tp={tp}: only {n_local} local devices")
            continue
        log(f"tp={tp} ...")
        mesh = (make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
                if tp > 1 else None)
        tok_s = bench_point(cfg, mesh, args, impl)
        results[tp] = tok_s
        print(json.dumps({
            "metric": f"scaling_tok_s_{args.config}_tp{tp}"
                      + (f"_proc{args.pid}" if args.nprocs > 1 else ""),
            "value": round(tok_s, 1), "unit": "tok/s",
            "devices": tp * args.nprocs}), flush=True)

    if 1 in results:
        for tp, v in sorted(results.items()):
            if tp == 1:
                continue
            eff = v / (tp * results[1])
            print(json.dumps({
                "metric": f"scaling_efficiency_{args.config}_tp{tp}",
                "value": round(eff, 4), "unit": "fraction",
                "target": 0.8}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
