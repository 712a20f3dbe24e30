#!/usr/bin/env python
"""Headline benchmark: 7B w4-g128 batch-1 greedy decode tokens/s on one
TPU chip, mirroring the reference's headline config (Llama-2-7B AWQ,
-n 256; ~200 tok/s on RTX 4090, /root/reference/README.md:86,111).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N/200.787}

No AWQ checkpoint ships with this repo, so weights are synthetic random
packed tensors at the exact 7B shapes — decode is weight-bandwidth-bound,
so tokens/s is independent of weight values.
"""

import argparse
import json
import sys
import time

BASELINE_TOK_S = 200.787402  # reference transcript (README.md:111)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b", choices=["7b", "13b", "tiny"])
    ap.add_argument("--mode", default="decode",
                    choices=["decode", "batch", "prefill"],
                    help="decode: batch-1 tok/s (headline); batch: "
                         "continuous-batching aggregate tok/s; prefill: "
                         "prompt-processing tok/s (time-to-first-token "
                         "side of serving; the reference publishes no "
                         "prefill number)")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--decode-steps", type=int, default=None,
                    help="long-context accounting: prefill the WHOLE "
                         "prompt (untimed), then time exactly N decode "
                         "steps at positions prompt_len..prompt_len+N "
                         "— pure decode tok/s at depth (--steps's "
                         "reference accounting counts prompt positions "
                         "and would never reach deep positions when "
                         "steps < prompt_len)")
    ap.add_argument("--prompt-len", type=int, default=8)
    ap.add_argument("--max-seq", type=int, default=None)
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="decode steps per device-resident lax.scan "
                         "chunk (host syncs once per chunk); default "
                         "128 for batch-1 decode, 16 for --mode batch "
                         "(slot-reuse granularity)")
    ap.add_argument("--repeats", type=int, default=6,
                    help="timed runs (best-of; each ~1.5 s at 7B — the "
                         "chip ramps over the first runs, so more "
                         "repeats cost little and de-noise the best)")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of run 0 into DIR")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache (batch mode: halves KV bandwidth)")
    ap.add_argument("--kv-bits", type=int, default=8, choices=[8, 4],
                    help="quantized-KV width; 4 = nibble-packed int4 "
                         "(quarter footprint, implies --kv-quant)")
    ap.add_argument("--admit-long", type=int, default=0, metavar="N",
                    help="batch mode: every 4th request arrives with an "
                         "N-token prompt (block-prefill admissions mixed "
                         "into decode; LLAMA_TPU_SYNC_PREFILL=1 restores "
                         "the stalling synchronous prefill for A/B)")
    ap.add_argument("--attn-impl", default=None,
                    choices=["auto", "einsum", "batched",
                             "batched_static", "fused_step"],
                    help="Pallas decode-attention kernel (batched: "
                         "serving shapes, int8-KV-native; fused_step: "
                         "whole attention step in one kernel; auto "
                         "picks fused_step at deep windows)")
    ap.add_argument("--lm-head-8bit", dest="lm_head_bits",
                    action="store_const", const=8,
                    help="per-row int8 lm_head")
    ap.add_argument("--lm-head-bits", dest="lm_head_bits", type=int,
                    default=None, choices=[8, 4],
                    help="quantize the lm_head (8: per-row int8, "
                         "4: w4-g128 via the int4 kernel)")
    ap.add_argument("--spec", default=None,
                    choices=["ngram", "none", "both"],
                    help="greedy speculative decoding (prompt-lookup); "
                         "decode mode only; 'none' forces plain decode; "
                         "'both' (the decode-mode default) measures "
                         "plain AND spec in one chip window and emits "
                         "both in the JSON line, so a slow window can "
                         "never hide a plain-decode regression behind "
                         "the spec number (VERDICT r4)")
    ap.add_argument("--spec-k", type=int, default=7)
    ap.add_argument("--platform", default=None,
                    help="override the JAX platform (e.g. cpu for a "
                         "plumbing smoke; the axon sitecustomize forces "
                         "JAX_PLATFORMS, so only jax.config works)")
    ap.add_argument("--model", default=None, metavar="BIN",
                    help="benchmark a REAL packed checkpoint instead "
                         "of synthetic weights (config from its "
                         "header; --config is ignored) — the honest-"
                         "acceptance path for speculative numbers")
    ap.add_argument("-z", "--tokenizer", default=None,
                    help="tokenizer.bin (with --model + --prompt-file: "
                         "prompts are real text, so spec acceptance "
                         "reflects real prose, not synthetic cycles)")
    ap.add_argument("--prompt-file", default=None, metavar="TXT",
                    help="batch mode: one prompt per line, tokenized "
                         "with -z and cycled over --requests")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel over N chips (mesh + shard_map; "
                         "needs N devices — the multi-chip benchmark "
                         "config, BASELINE.json '13B tensor-sharded')")
    args = ap.parse_args()

    # decode-mode default: measure BOTH plain and speculative decode in
    # the same chip window and emit both in ONE JSON line (VERDICT r4:
    # a single-number headline let chip-window weather hide a plain
    # regression behind the spec value — and vice versa). Each leg
    # re-execs this script so its tuned profile's env vars (manual-DMA
    # ring depth, compiler flags differ between plain and spec) apply
    # cleanly per-process; a trailing short plain re-bracket quantifies
    # within-session window drift.
    if args.mode == "decode" and args.spec in (None, "both") \
            and args.decode_steps is None:
        return dual_run(args)
    if args.spec == "both":
        args.spec = None  # batch/long-context modes: tuned default

    # chip-tuned defaults: tools/chip_session.sh A/Bs the kernel
    # configs on real hardware and records the winner here, so a plain
    # `python bench.py` (the driver's round-end invocation) runs the
    # best chip-validated configuration automatically
    import os

    dflt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_defaults.json")
    if args.attn_impl is None and os.path.exists(dflt):
        with open(dflt) as f:
            tuned = json.load(f)
        key = "batch" if args.mode == "batch" else "decode"
        # plain decode (--spec none) and the speculative default want
        # DIFFERENT staging strategies (r3 chip A/Bs: the manual-DMA
        # ring wins plain by ~3% but loses spec by ~3-5% — the verify
        # block amortizes weight reads and MSA overlap wins there), so
        # the two modes carry separate tuned profiles
        if args.mode == "decode" and args.spec == "none" \
                and "decode_plain" in tuned:
            key = "decode_plain"
        cfg_t = tuned.get(key, {})
        # tuned env knobs (e.g. the manual-DMA ring depth); explicitly
        # preset env vars still win
        for k, v in (cfg_t.get("env") or {}).items():
            os.environ.setdefault(k, str(v))
        args.attn_impl = cfg_t.get("attn_impl")
        # quantized-lm_head / chunk-size / compiler-flag defaults are
        # promoted by tools/pick_bench_defaults.py only when measured
        # faster AND (for the head) PPL-gated on the real model —
        # explicit flags and a preset LLAMA_TPU_COMPILER_OPTS still win
        if args.lm_head_bits is None and cfg_t.get("lm_head_bits"):
            args.lm_head_bits = int(cfg_t["lm_head_bits"])
        if args.chunk_size is None and cfg_t.get("chunk_size"):
            args.chunk_size = int(cfg_t["chunk_size"])
        # speculative decoding is promotable too: greedy spec decode is
        # LOSSLESS (the output stream is bit-identical to plain decode,
        # tests/test_spec_decode.py), so a chip-measured win is a fair
        # default for the tokens/s headline
        if args.spec is None and cfg_t.get("spec"):
            args.spec = cfg_t["spec"]
            if cfg_t.get("spec_k"):
                args.spec_k = int(cfg_t["spec_k"])
        if (cfg_t.get("compiler_opts")
                and "LLAMA_TPU_COMPILER_OPTS" not in os.environ):
            os.environ["LLAMA_TPU_COMPILER_OPTS"] = cfg_t["compiler_opts"]
        log(f"tuned defaults ({key}) from bench_defaults.json: {cfg_t}")
    if args.spec == "none":
        args.spec = None

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/llama_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from llama_cu_awq_tpu.config import LLAMA2_7B, LLAMA2_13B, ModelConfig
    from llama_cu_awq_tpu.engine import InferenceEngine
    from llama_cu_awq_tpu.models import synthetic_params

    # the axon TPU tunnel HANGS jax.devices() when it is down; probe
    # with a deadline so an outage records a clear failure line in the
    # driver log instead of hanging the round-end bench forever
    import concurrent.futures as _cf

    with _cf.ThreadPoolExecutor(1) as _ex:
        try:
            devs = _ex.submit(jax.devices).result(timeout=300)
        except _cf.TimeoutError:
            print("FATAL: device backend unreachable after 300s "
                  "(TPU tunnel down?) — no benchmark possible",
                  flush=True)
            import os as _os

            _os._exit(3)  # the probe thread is stuck; skip atexit
    platform = devs[0].platform
    on_tpu = platform == "tpu"
    log(f"platform: {platform}, devices: {devs}")

    if args.config == "7b":
        cfg = LLAMA2_7B
    elif args.config == "13b":
        cfg = LLAMA2_13B
    else:
        cfg = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=4,
                          n_kv_heads=4, vocab_size=512, seq_len=512)
    max_seq = args.max_seq or min(512, cfg.seq_len)
    if args.chunk_size is None:
        args.chunk_size = 16 if args.mode == "batch" else 128

    if args.model:
        from llama_cu_awq_tpu.io.checkpoint import load_checkpoint
        from llama_cu_awq_tpu.models import params_from_checkpoint

        log(f"loading real checkpoint {args.model}...")
        ckpt = load_checkpoint(args.model)
        cfg = ckpt.config
        args.config = "real"
        max_seq = args.max_seq or min(512, cfg.seq_len)
        params = params_from_checkpoint(ckpt, tpu_layout=on_tpu)
        if args.lm_head_bits:
            from llama_cu_awq_tpu.models import quantize_lm_head

            params = quantize_lm_head(params, bits=args.lm_head_bits)
        impl = "pallas" if on_tpu else "dequant"
        mesh = None
        if args.mode == "batch":
            return bench_batch(args, cfg, params, max_seq, impl, mesh)
        if args.mode == "prefill":
            return bench_prefill(args, cfg, params, max_seq, impl, mesh)
        # decode mode on a REAL checkpoint (VERDICT r4 item 6): the
        # whole pipeline — loader, packing, kernels, sampler — measured
        # jointly at speed; with -z (+ optionally --prompt-file) the
        # prompt is real text, so spec acceptance reflects real prose
    else:
        log(f"building synthetic {args.config} params "
            f"(tpu_layout={on_tpu}, tp={args.tp})...")
        t0 = time.time()
        mesh = None
        if args.tp > 1:
            from llama_cu_awq_tpu.parallel import (make_mesh,
                                                   tp_synthetic_params)

            mesh = make_mesh(tp=args.tp, dp=1,
                             devices=jax.devices()[:args.tp])
            params = tp_synthetic_params(cfg, mesh, seed=0)
        else:
            params = synthetic_params(cfg, seed=0, tpu_layout=on_tpu)
            if args.lm_head_bits:
                from llama_cu_awq_tpu.models import quantize_lm_head

                params = quantize_lm_head(params, bits=args.lm_head_bits)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        log(f"params ready in {time.time()-t0:.1f}s")

        impl = "pallas" if on_tpu else "dequant"
        if args.mode == "batch":
            return bench_batch(args, cfg, params, max_seq, impl, mesh)
        if args.mode == "prefill":
            return bench_prefill(args, cfg, params, max_seq, impl, mesh)

    engine = InferenceEngine(
        params, cfg, tokenizer=None, act_dtype=jnp.bfloat16,
        matmul_impl=impl, attn_impl=args.attn_impl,
        max_seq=max_seq, temperature=0.0, seed=1234,
        chunk_size=args.chunk_size, spec=args.spec,
        spec_k=args.spec_k, mesh=mesh,
        kv_quant=(4 if args.kv_bits == 4 else args.kv_quant))

    prompt = list(range(5, 5 + args.prompt_len))
    if args.model and args.tokenizer:
        from llama_cu_awq_tpu.tokenizer import Tokenizer

        tk = Tokenizer(args.tokenizer, cfg.vocab_size)
        text = (open(args.prompt_file).readline().strip()
                if args.prompt_file else "Once upon a time")
        prompt = tk.encode(text, bos=True, eos=False)
        log(f"real prompt: {len(prompt)} tokens")
    if args.decode_steps:
        # long-context: untimed full-prompt prefill + timed decode-only
        steps = min(args.prompt_len + args.decode_steps, max_seq - 2)
        untimed_prefill = True
    else:
        steps = min(args.steps, max_seq - 2)
        untimed_prefill = False

    log("warmup (compiles prefill + decode buckets)...")
    t0 = time.time()
    engine.generate_benchmark(prompt, steps, untimed_prefill)
    log(f"warmup done in {time.time()-t0:.1f}s")

    best = 0.0
    for i in range(args.repeats):
        if i == 0 and args.profile:
            from llama_cu_awq_tpu.utils import profile_trace

            with profile_trace(args.profile):
                tokens, dt, tok_s = engine.generate_benchmark(
                    prompt, steps, untimed_prefill)
            log(f"profiler trace written to {args.profile}")
        else:
            tokens, dt, tok_s = engine.generate_benchmark(
                prompt, steps, untimed_prefill)
        log(f"run {i}: {len(tokens)} generated, "
            f"{len(tokens) if untimed_prefill else steps - 1} timed "
            f"steps in {dt:.3f}s -> {tok_s:.2f} tok/s")
        best = max(best, tok_s)
    acceptance = None
    if args.spec:
        # transparency: spec tok/s depends on proposal acceptance, which
        # depends on output content (synthetic random-weight output is
        # more repetitive than real prose) — always print the rate
        ss = engine.spec_stats
        if ss.get("proposed"):
            acceptance = ss["accepted"] / ss["proposed"]
            log(f"spec acceptance: {ss['accepted']}/{ss['proposed']} "
                f"({acceptance:.1%}) over "
                f"{ss['verifies']} verifies")

    result = {
        "metric": f"decode_tok_s_{args.config}_w4g128_b1"
                  + (f"_tp{args.tp}" if args.tp > 1 else "")
                  + (f"_lmh{args.lm_head_bits}" if args.lm_head_bits else "")
                  + (f"_kv{args.kv_bits}" if (args.kv_quant
                                              or args.kv_bits == 4)
                     else "")
                  + (f"_spec{args.spec_k}" if args.spec else "")
                  + (f"_ctx{args.prompt_len}" if args.decode_steps
                     else ""),
        "value": round(best, 2),
        "unit": "tok/s",
        # a real checkpoint may not be the reference's 7B headline
        # config; keep the ratio only for the synthetic exact-shape runs
        "vs_baseline": (None if args.model and args.config != "7b"
                        else round(best / BASELINE_TOK_S, 4)),
    }
    if acceptance is not None:
        result["spec_acceptance"] = round(acceptance, 4)
        result["spec_workload"] = ("real" if args.model and args.tokenizer
                                   else "synthetic")
    print(json.dumps(result))


def dual_run(args):
    """Default decode benchmark: plain decode, then speculative decode,
    then a short plain re-bracket — all in one chip session — combined
    into ONE JSON line. Plain (`decode_tok_s_plain`) is the reference-
    comparable number (the reference's 200.787 tok/s headline is plain
    greedy decode, /root/reference/README.md:111); spec is reported
    alongside with its acceptance rate, and the re-bracket exposes
    within-session window drift so neither number silently rides chip
    weather (VERDICT r4 'what's weak' 1-2)."""
    import os
    import subprocess

    base_cmd = [sys.executable, os.path.abspath(__file__)]
    cleaned, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a == "--spec":
            skip = True
            continue
        if a.startswith("--spec="):
            continue
        cleaned.append(a)

    # the tunneled TPU intermittently hangs a fresh process in warmup
    # (measured ~minutes-long stalls with ~0 CPU); a leg therefore gets
    # a hard timeout and one retry so the driver's round-end bench can
    # never wedge on chip weather
    leg_timeout = int(os.environ.get("LLAMA_BENCH_LEG_TIMEOUT", "1800"))

    def leg(spec, repeats=None):
        cmd = base_cmd + cleaned + ["--spec", spec]
        if repeats is not None:
            cmd += ["--repeats", str(repeats)]
        for attempt in (1, 2):
            log(f"[dual] bench.py {' '.join(cmd[2:])} (attempt {attempt})")
            t0 = time.time()
            try:
                out = subprocess.run(cmd, stdout=subprocess.PIPE,
                                     text=True, timeout=leg_timeout)
            except subprocess.TimeoutExpired:
                log(f"[dual] leg --spec {spec} HUNG after {leg_timeout}s"
                    " — killed")
                continue
            if out.returncode:
                log(f"[dual] leg --spec {spec} FAILED rc={out.returncode}")
                continue
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            res = json.loads(lines[-1]) if lines else None
            log(f"[dual] leg --spec {spec} done in {time.time()-t0:.0f}s: "
                f"{res and res.get('value')}")
            return res
        return None

    plain = leg("none")
    spec = leg("ngram")
    # drift bracket: 3 repeats vs the plain leg's 6 biases best-of
    # slightly low (~1%); the signal this guards against is multi-
    # percent window decay, so the bias is acceptable at half the cost
    rebracket = leg("none", repeats=3)
    if plain is None and spec is None:
        raise SystemExit("both dual-run legs failed")
    p_val = plain["value"] if plain else None
    s_val = spec["value"] if spec else None
    win = max([r for r in (plain, spec) if r],
              key=lambda r: r["value"])
    result = dict(win)  # headline = faster leg, honestly named
    result["decode_tok_s_plain"] = p_val
    result["decode_tok_s_spec"] = s_val
    if spec and spec.get("spec_acceptance") is not None:
        result["spec_acceptance"] = spec["spec_acceptance"]
        result["spec_workload"] = spec.get("spec_workload", "synthetic")
    if rebracket and p_val:
        result["plain_rebracket"] = rebracket["value"]
        result["window_drift"] = round(rebracket["value"] / p_val, 4)
    print(json.dumps(result))


def bench_prefill(args, cfg, params, max_seq, impl, mesh=None):
    """Prompt-processing throughput: teacher-forced block prefill of an
    N-token prompt (engine._prefill — PREFILL_BLOCK-wide forward calls
    filling the KV cache), timed to cache-ready. This is the
    time-to-first-token side of serving; decode tok/s is bandwidth-bound
    while prefill is MXU-bound, so the two need separate accounting."""
    import jax
    import jax.numpy as jnp

    from llama_cu_awq_tpu.engine import InferenceEngine

    engine = InferenceEngine(
        params, cfg, tokenizer=None, act_dtype=jnp.bfloat16,
        matmul_impl=impl, attn_impl=args.attn_impl, max_seq=max_seq,
        temperature=0.0, seed=1234, chunk_size=args.chunk_size, mesh=mesh)
    n = min(args.prompt_len, max_seq - 2)
    prompt = [5 + i % 500 for i in range(n)]

    def one_run():
        engine.reset()
        jax.block_until_ready(engine.cache.k[-1])
        t0 = time.time()
        engine._prefill(prompt)
        # fetch a real value: on the tunneled platform block_until_ready
        # alone returned before the device work drained (measured 113k
        # tok/s "prefill" = 7x MXU peak — impossible), so fence with a
        # device_get of data every layer's compute feeds
        float(jnp.sum(engine.cache.k[-1][..., -1, :].astype(jnp.float32)))
        return time.time() - t0

    log(f"warmup (compiles prefill blocks for a {n}-token prompt)...")
    one_run()
    best = None
    for i in range(args.repeats):
        if i == 0 and args.profile:
            from llama_cu_awq_tpu.utils import profile_trace

            with profile_trace(args.profile):
                dt = one_run()
            log(f"profiler trace written to {args.profile}")
        else:
            dt = one_run()
        log(f"run {i}: {n} prompt tokens in {dt*1e3:.1f}ms -> "
            f"{n/dt:.0f} tok/s prefill")
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "metric": f"prefill_tok_s_{args.config}_w4g128_p{n}"
                  + (f"_tp{args.tp}" if args.tp > 1 else ""),
        "value": round(n / best, 1),
        "unit": "tok/s",
        # the reference publishes no prefill number (prompts feed
        # token-by-token, llama2_q4.cu:462-479) — comparing prefill
        # tok/s against its DECODE baseline would be meaningless
        "vs_baseline": None,
    }))


def bench_batch(args, cfg, params, max_seq, impl, mesh=None):
    """Continuous-batching aggregate throughput: N requests over S slots,
    one chip (BASELINE.json's continuous-batching axis). Decode is
    weight-bandwidth-bound, so aggregate tok/s should approach
    slots x batch-1 tok/s until the KV-cache bandwidth bites."""
    import time

    import jax.numpy as jnp

    from llama_cu_awq_tpu.engine.batch import BatchEngine
    from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

    if args.prompt_file:
        from llama_cu_awq_tpu.tokenizer import Tokenizer

        assert args.tokenizer, "--prompt-file needs -z tokenizer.bin"
        tk = Tokenizer(args.tokenizer, cfg.vocab_size)
        lines = [ln.strip() for ln in open(args.prompt_file)
                 if ln.strip()]
        texts = [lines[i % len(lines)] for i in range(args.requests)]
        prompts = [tk.encode(t, bos=True, eos=False)[:max_seq // 2]
                   for t in texts]
        longest = max(len(p) for p in prompts)
        steps = min(args.steps, max_seq - 2 - longest)
    else:
        longest = max(args.prompt_len, args.admit_long)
        steps = min(args.steps, max_seq - 2 - longest)
        prompts = [[BOS_TOKEN] + [5 + (i + j) % 500 for j in range(
            args.prompt_len - 1)] for i in range(args.requests)]
    if args.admit_long:
        # every 4th request arrives with a LONG prompt: its block
        # prefill interleaves with (or, with LLAMA_TPU_SYNC_PREFILL=1,
        # stalls) the other slots' decode — the admission-smoothness
        # A/B for engine/batch.py _advance_prefill
        for i in range(0, args.requests, 4):
            prompts[i] = [BOS_TOKEN] + [7 + (i + j) % 500 for j in
                                        range(args.admit_long - 1)]

    eng = BatchEngine(params, cfg, n_slots=args.slots, max_seq=max_seq,
                      act_dtype=jnp.bfloat16, matmul_impl=impl,
                      kv_quant=(4 if args.kv_bits == 4
                                else args.kv_quant),
                      attn_impl=args.attn_impl,
                      temperature=0.0, chunk_size=args.chunk_size,
                      spec=args.spec, spec_k=args.spec_k, mesh=mesh)

    def one_run():
        eng.reset()
        for p in prompts:
            eng.submit(p, max_new=steps)
        t0 = time.time()
        out = eng.run()
        dt = time.time() - t0
        total = sum(len(v) for v in out.values())
        return total, dt, total / dt

    log("warmup (compiles batched prefill + decode buckets)...")
    one_run()
    best = 0.0
    for i in range(args.repeats):
        if i == 0 and args.profile:
            from llama_cu_awq_tpu.utils import profile_trace

            with profile_trace(args.profile):
                total, dt, tok_s = one_run()
            log(f"profiler trace written to {args.profile}")
            continue
        total, dt, tok_s = one_run()
        log(f"run {i}: {args.requests} requests, {total} tokens in "
            f"{dt:.2f}s -> {tok_s:.1f} tok/s aggregate")
        best = max(best, tok_s)
    if args.spec:
        ss = eng.spec_stats
        if ss.get("proposed"):
            log(f"spec acceptance: {ss['accepted']}/{ss['proposed']} "
                f"({ss['accepted']/ss['proposed']:.1%}) over "
                f"{ss['blocks']} blocks"
                + (" [REAL prose]" if args.prompt_file else
                   " [synthetic]"))
    print(json.dumps({
        "metric": f"batch_tok_s_{args.config}_w4g128_s{args.slots}"
                  f"_r{args.requests}"
                  + ("_kvq4" if args.kv_bits == 4
                     else ("_kvq8" if args.kv_quant else ""))
                  + (f"_tp{args.tp}" if args.tp > 1 else "")
                  + (f"_spec{args.spec_k}" if args.spec else "")
                  + (f"_admL{args.admit_long}" if args.admit_long else ""),
        "value": round(best, 1),
        "unit": "tok/s",
        # a real (non-7B) checkpoint is not comparable to the
        # reference's 7B decode headline
        "vs_baseline": (None if args.model
                        else round(best / BASELINE_TOK_S, 4)),
    }))


if __name__ == "__main__":
    main()
