#!/usr/bin/env python
"""A/B microbenchmark of the batched decode-attention kernel variants
at 7B serving shapes: scalar-prefetch early exit vs static block maps,
int8-native vs bf16, versus the XLA einsum path — isolates kernel
scheduling effects from the full engine step.

Usage: python tools/microbench_attn.py [--batch 32] [--window 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=30, warmup=2):
    import jax

    jitted = jax.jit(fn)
    for _ in range(warmup):
        out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/llama_tpu_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from llama_cu_awq_tpu.models.llama import _attention, quantize_kv
    from llama_cu_awq_tpu.ops.linear import _on_tpu
    from llama_cu_awq_tpu.ops.pallas.batched_attention import (
        batched_decode_attention,
    )

    B, A, H, KV, D = (args.batch, args.window, args.heads, args.kv_heads,
                      128)
    interp = not _on_tpu()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, A, KV, D)) * .3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, A, KV, D)) * .3, jnp.bfloat16)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    pos_full = jnp.full((B,), A - 1, jnp.int32)
    pos_mix = jnp.asarray(rng.integers(0, A, B), jnp.int32)
    kv_bytes = 2 * B * A * KV * D

    print(f"B={B} A={A} H={H} KV={KV} D={D}  "
          f"int8 KV bytes/call {kv_bytes/1e6:.1f} MB")

    def report(name, dt, nbytes):
        print(f"  {name:44s} {dt*1e6:9.1f} us   "
              f"{nbytes/dt/1e9:7.1f} GB/s")

    for name, posv in [("pos=full", pos_full), ("pos=mixed", pos_mix)]:
        frac = float(jnp.mean((posv + 1) / A))
        print(f"-- {name} (mean fill {frac:.2f}) --")
        for ee in (True, False):
            dt = timeit(
                lambda qq, kk, vv, pp, kss, vss: batched_decode_attention(
                    qq, kk, vv, pp, kss, vss, interpret=interp,
                    early_exit=ee),
                q, kq, vq, posv, ks, vs, iters=args.iters)
            report(f"kernel int8-native early_exit={ee}", dt,
                   kv_bytes * (frac if ee else 1.0))
        dt = timeit(
            lambda qq, kk, vv, pp: batched_decode_attention(
                qq, kk, vv, pp, interpret=interp),
            q, k, v, posv, iters=args.iters)
        report("kernel bf16 early_exit=True", dt, 2 * kv_bytes * frac)

        def einsum_int8(qq, kk, vv, kss, vss, pp):
            k_att = kk.astype(jnp.bfloat16) * kss[..., None].astype(
                jnp.bfloat16)
            v_att = vv.astype(jnp.bfloat16) * vss[..., None].astype(
                jnp.bfloat16)
            return _attention(qq[:, None], k_att, v_att, pp,
                              jnp.bfloat16, impl="einsum")

        dt = timeit(einsum_int8, q, kq, vq, ks, vs, posv,
                    iters=args.iters)
        report("einsum int8-dequant (engine fallback)", dt, kv_bytes)

        # bf16 einsum — the actual batch-1 engine path
        dt = timeit(
            lambda qq, kk, vv, pp: _attention(qq[:, None], kk, vv, pp,
                                              jnp.bfloat16, impl="einsum"),
            q, k, v, posv, iters=args.iters)
        report("einsum bf16 (batch-1 engine path)", dt, 2 * kv_bytes)

        # fused attention-step kernel (split+rope+quantize inside)
        from llama_cu_awq_tpu.ops.pallas.attention_step import (
            attention_step, rope_rows)

        qkv = jnp.asarray(
            rng.standard_normal((B, (H + 2 * KV) * D)), jnp.bfloat16)
        cos2, sinm = rope_rows(posv, D, 10000.0)
        dt = timeit(
            lambda qq, kk, vv, pp, c2, sm, kss, vss: attention_step(
                qq, kk, vv, pp, c2, sm, kss, vss, n_heads=H,
                interpret=interp)[0],
            qkv, kq, vq, posv, cos2, sinm, ks, vs, iters=args.iters)
        report("fused_step int8-native early_exit=True", dt,
               kv_bytes * frac)
        dt = timeit(
            lambda qq, kk, vv, pp, c2, sm: attention_step(
                qq, kk, vv, pp, c2, sm, n_heads=H,
                interpret=interp)[0],
            qkv, k, v, posv, cos2, sinm, iters=args.iters)
        report("fused_step bf16 early_exit=True", dt, 2 * kv_bytes * frac)


if __name__ == "__main__":
    sys.exit(main())
