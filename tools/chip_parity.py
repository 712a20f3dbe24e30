#!/usr/bin/env python
"""On-chip numeric parity gate for the kernel-variant A/B matrix.

The kernel variants (fused_step / batched*) are validated in
interpret mode on CPU by the test suite, but interpret mode is not the
Mosaic compiler: a variant could compile on the chip and compute
garbage while benchmarking fast. This script runs every variant that
tools/chip_session.sh benchmarks, at a small shape that still engages
the kernels (head_dim=128, cache len % 128 == 0), and compares logits
against the einsum/base path ON THE SAME PLATFORM:

  decode gate (bf16 KV, B=1): 48 teacher-forced decode steps — covers
    the write->read cache round trip every decode stream depends on.
  batch gate (int8 KV, B=4): one step at per-slot positions
    [1, 37, 128, 255] over a random pre-filled cache — covers per-slot
    early exit, window masking, and a block-boundary crossing.

Writes <logdir>/parity.json; tools/pick_bench_defaults.py refuses to
promote a variant whose parity entry failed, so a fast-but-wrong
kernel can never become the driver's round-end bench config.

Tolerance: bf16 activations give |d|/max|base| up to ~3e-2 between
attention implementations (same bound the greedy-parity tests use); a
miscompiled kernel is O(1) off, so the 8e-2 gate separates cleanly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import json
import os
import sys
import time

import numpy as np

TOL = 8e-2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_session"
    os.makedirs(logdir, exist_ok=True)
    n_steps = int(os.environ.get("CHIP_PARITY_STEPS", "48"))

    import jax

    if len(sys.argv) > 2:  # CPU smoke: chip_parity.py <logdir> cpu
        jax.config.update("jax_platforms", sys.argv[2])
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/llama_tpu_jax_cache")
    import jax.numpy as jnp

    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.models import synthetic_params
    from llama_cu_awq_tpu.models.llama import forward, init_kv_cache

    cfg = ModelConfig(dim=512, hidden_dim=1536, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=1024, seq_len=512)
    A = 256
    params = synthetic_params(cfg, seed=7, tpu_layout=True)
    log(f"platform: {jax.devices()[0].platform}")

    def step_fn(attn_impl):
        @jax.jit
        def _step(params, tok, pos, cache):
            return forward(params, cfg, tok, pos, cache, attn_len=A,
                           act_dtype=jnp.bfloat16, matmul_impl="pallas",
                           attn_impl=attn_impl)
        return _step

    # (chain / chain_fstep / mono rows retired in round 4 with their
    # kernels — tools/experiments/int4_chain.py)
    DECODE = {
        "base": (None, False),
        "batched": ("batched", False),
        "fused_step": ("fused_step", False),
    }
    BATCH = {
        "base": (None, False),
        "batched": ("batched", False),
        "batched_static": ("batched_static", False),
        "fused_step": ("fused_step", False),
    }

    results = {"decode": {}, "batch": {}}

    # ---- decode gate: B=1, 48 steps, teacher-forced on base's stream --
    def run_decode(impl, chain, stream):
        del chain
        step = step_fn(impl)
        cache = init_kv_cache(cfg, 1, A)
        logits_all, toks = [], []
        tok = jnp.asarray([[1]], jnp.int32)
        for t in range(n_steps):
            lo, cache = step(params, tok,
                             jnp.asarray([t], jnp.int32), cache)
            lo = np.asarray(lo, np.float32)
            logits_all.append(lo)
            toks.append(int(lo[0].argmax()))
            nxt = stream[t] if stream is not None else toks[-1]
            tok = jnp.asarray([[nxt]], jnp.int32)
        return np.stack(logits_all), toks

    t0 = time.time()
    base_lo, base_stream = run_decode(None, False, None)
    scale = np.abs(base_lo).max()
    log(f"decode base: {time.time()-t0:.1f}s, logit scale {scale:.2f}")
    results["decode"]["base"] = {"max_rel_diff": 0.0, "ok": True}
    for name, (impl, chain) in DECODE.items():
        if name == "base":
            continue
        t0 = time.time()
        try:
            lo, toks = run_decode(impl, chain, base_stream)
            d = float(np.abs(lo - base_lo).max() / scale)
            flips = int(sum(a != b for a, b in zip(toks, base_stream)))
            ok = d < TOL
            results["decode"][name] = {
                "max_rel_diff": round(d, 5), "argmax_flips": flips,
                "ok": ok}
            log(f"decode {name}: rel diff {d:.4f}, {flips} flips, "
                f"{'OK' if ok else 'FAIL'} ({time.time()-t0:.1f}s)")
        except Exception as e:  # compile or runtime failure
            results["decode"][name] = {"ok": False,
                                       "error": f"{type(e).__name__}: "
                                                f"{str(e)[:300]}"}
            log(f"decode {name}: FAIL {type(e).__name__} "
                f"({time.time()-t0:.1f}s)")

    # ---- down->qkv chain gate (LLAMA_TPU_DOWN_QKV=1): needs a dim
    # where out_pad == planar_pad (the decode-gate dim 512 pads 512 vs
    # 1024 so the chain silently disengages there) ----
    cfg_c = ModelConfig(dim=1024, hidden_dim=1536, n_layers=2,
                        n_heads=8, n_kv_heads=8, vocab_size=1024,
                        seq_len=512)
    params_c = synthetic_params(cfg_c, seed=9, tpu_layout=True)

    def run_decode_chain(env_on, stream):
        if env_on:
            os.environ["LLAMA_TPU_DOWN_QKV"] = "1"
        else:
            os.environ.pop("LLAMA_TPU_DOWN_QKV", None)

        @jax.jit
        def _step(params, tok, pos, cache):
            return forward(params, cfg_c, tok, pos, cache, attn_len=A,
                           act_dtype=jnp.bfloat16, matmul_impl="pallas")

        cache = init_kv_cache(cfg_c, 1, A)
        logits_all, toks = [], []
        tok = jnp.asarray([[1]], jnp.int32)
        for t in range(n_steps):
            lo, cache = _step(params_c, tok,
                              jnp.asarray([t], jnp.int32), cache)
            lo = np.asarray(lo, np.float32)
            logits_all.append(lo)
            toks.append(int(lo[0].argmax()))
            nxt = stream[t] if stream is not None else toks[-1]
            tok = jnp.asarray([[nxt]], jnp.int32)
        return np.stack(logits_all), toks

    t0 = time.time()
    try:
        cb_lo, cb_stream = run_decode_chain(False, None)
        cscale = np.abs(cb_lo).max()
        lo, toks = run_decode_chain(True, cb_stream)
        d = float(np.abs(lo - cb_lo).max() / cscale)
        flips = int(sum(a != b for a, b in zip(toks, cb_stream)))
        ok = d < TOL
        results["decode"]["dq_chain"] = {
            "max_rel_diff": round(d, 5), "argmax_flips": flips, "ok": ok}
        log(f"decode dq_chain: rel diff {d:.4f}, {flips} flips, "
            f"{'OK' if ok else 'FAIL'} ({time.time()-t0:.1f}s)")
    except Exception as e:
        results["decode"]["dq_chain"] = {
            "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:300]}"}
        log(f"decode dq_chain: FAIL {type(e).__name__} "
            f"({time.time()-t0:.1f}s)")
    finally:
        os.environ.pop("LLAMA_TPU_DOWN_QKV", None)

    # ---- batch gate: B=4, int8 KV, one step at staggered positions ---
    B = 4
    rng = np.random.default_rng(11)
    pos = jnp.asarray([1, 37, 128, 255], jnp.int32)
    tok = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, 1)), jnp.int32)
    cache = init_kv_cache(cfg, B, A, quantized=True)
    shape = (B, A, cfg.n_kv_heads, cfg.head_dim)
    cache = cache._replace(
        k=[jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)
           for _ in range(cfg.n_layers)],
        v=[jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)
           for _ in range(cfg.n_layers)],
        k_scale=[jnp.asarray(
            np.abs(rng.normal(0, 0.02, shape[:-1])) + 1e-4, jnp.float32)
            for _ in range(cfg.n_layers)],
        v_scale=[jnp.asarray(
            np.abs(rng.normal(0, 0.02, shape[:-1])) + 1e-4, jnp.float32)
            for _ in range(cfg.n_layers)])

    def run_batch(impl, chain):
        del chain
        lo, c2 = step_fn(impl)(params, tok, pos, cache)
        return (np.asarray(lo, np.float32),
                np.asarray(c2.k[0], np.int8),
                np.asarray(c2.k_scale[0], np.float32))

    base_blo, base_k, base_ks = run_batch(None, False)
    bscale = np.abs(base_blo).max()
    results["batch"]["base"] = {"max_rel_diff": 0.0, "ok": True}
    for name, (impl, chain) in BATCH.items():
        if name == "base":
            continue
        t0 = time.time()
        try:
            lo, k, ks = run_batch(impl, chain)
            d = float(np.abs(lo - base_blo).max() / bscale)
            # the new cache row must round-trip bit-exactly (codes) /
            # closely (scales) or later steps diverge
            kd = int(np.abs(k.astype(np.int32)
                            - base_k.astype(np.int32)).max())
            ok = d < TOL and kd <= 1
            results["batch"][name] = {
                "max_rel_diff": round(d, 5), "max_code_diff": kd,
                "ok": ok}
            log(f"batch {name}: rel diff {d:.4f}, code diff {kd}, "
                f"{'OK' if ok else 'FAIL'} ({time.time()-t0:.1f}s)")
        except Exception as e:
            results["batch"][name] = {"ok": False,
                                      "error": f"{type(e).__name__}: "
                                               f"{str(e)[:300]}"}
            log(f"batch {name}: FAIL {type(e).__name__} "
                f"({time.time()-t0:.1f}s)")

    out = os.path.join(logdir, "parity.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
