#!/usr/bin/env python
"""Per-op microbenchmark at 7B decode shapes: measures achieved HBM
bandwidth of each component of the per-token step so perf work targets
the actual gap (tok-time budget at speed-of-light vs measured).

Usage: python tools/microbench.py [--m 1] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=50, warmup=2):
    """Time fn on-device: `iters` iterations inside ONE jitted fori_loop
    with a loop-carried data dependency (so neither host dispatch nor
    loop-invariant hoisting pollutes the measurement)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def loop(x0, *rest):
        def body(_, carry):
            acc, x = carry
            out = fn(x, *rest)
            acc = acc + out.reshape(-1)[0].astype(jnp.float32)
            # feed acc back into the input: a true serial dependency
            x = x + (acc * 0).astype(x.dtype)
            return acc, x

        return lax.fori_loop(0, iters, body, (jnp.float32(0), x0))[0]

    jitted = jax.jit(loop)
    for _ in range(warmup):
        out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1, help="batch rows")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--attn-len", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/llama_tpu_jax_cache")

    from llama_cu_awq_tpu.config import LLAMA2_7B as cfg
    from llama_cu_awq_tpu.models.llama import synthetic_params, _attention
    from llama_cu_awq_tpu.ops.linear import dense_matmul, qmatmul
    from llama_cu_awq_tpu.ops.norms import rmsnorm

    m = args.m
    params = synthetic_params(cfg, seed=0, tpu_layout=True)
    jax.block_until_ready(params.embed)
    layer = params.layers[0]

    print(f"device: {jax.devices()[0].device_kind}, m={m}", file=sys.stderr)
    rows = []

    def bench(name, fn, *a, bytes_accessed=0, per_layer=False):
        dt = timeit(fn, *a, iters=args.iters)
        gbs = bytes_accessed / dt / 1e9 if bytes_accessed else 0.0
        rows.append((name, dt * 1e6, gbs,
                     dt * cfg.n_layers * 1e6 if per_layer else dt * 1e6))
        print(f"{name:24s} {dt*1e6:9.1f} us   {gbs:7.1f} GB/s", flush=True)

    x = jnp.ones((m, cfg.dim), jnp.bfloat16)
    h = jnp.ones((m, cfg.hidden_dim), jnp.bfloat16)

    def qbytes(qt):
        return (qt.qw.size * 4 + qt.meta.size * 2
                + m * (qt.n_pad * 2 + qt.d_pad * 4))

    bench("qkv (4096->12288)", lambda a: qmatmul(a, layer.wqkv, "pallas"),
          x, bytes_accessed=qbytes(layer.wqkv), per_layer=True)
    bench("o (4096->4096)", lambda a: qmatmul(a, layer.wo, "pallas"),
          x, bytes_accessed=qbytes(layer.wo), per_layer=True)
    bench("gate_up (4096->22016)",
          lambda a: qmatmul(a, layer.w_gate_up, "pallas"),
          x, bytes_accessed=qbytes(layer.w_gate_up), per_layer=True)
    bench("down (11008->4096)", lambda a: qmatmul(a, layer.w_down, "pallas"),
          h, bytes_accessed=qbytes(layer.w_down), per_layer=True)

    xe = jnp.ones((m, cfg.dim), params.lm_head.dtype)
    bench("lm_head (4096->32000)", lambda a: dense_matmul(a, params.lm_head),
          xe, bytes_accessed=params.lm_head.size * 2 + m * cfg.vocab_size * 4)

    A = args.attn_len
    q = jnp.ones((m, 1, cfg.n_heads, cfg.head_dim), jnp.bfloat16)
    k = jnp.ones((m, A, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
    pos = jnp.full((m,), A - 1, jnp.int32)
    bench(f"attention (A={A})",
          lambda qq, kk, p: _attention(qq, kk, kk, p, jnp.bfloat16),
          q, k, pos, bytes_accessed=2 * m * A * cfg.kv_dim * 2,
          per_layer=True)

    g = jnp.ones((cfg.dim,), jnp.float32)
    bench("rmsnorm", lambda a, w: rmsnorm(a, w), x, g,
          bytes_accessed=m * cfg.dim * 4, per_layer=True)

    # budget summary
    per_tok_us = sum(r[3] for r in rows)
    print(f"\nsum (1 token, {cfg.n_layers} layers): {per_tok_us/1e3:.2f} ms "
          f"-> {1e6/per_tok_us:.1f} tok/s upper bound from parts",
          flush=True)


if __name__ == "__main__":
    main()
