#!/usr/bin/env python
"""Sweep int4-kernel tilings per decode shape on the real chip.

Timings use a lax.scan harness that carries ~constant per-call overhead
on this platform, so ABSOLUTE numbers are inflated but RELATIVE ordering
across tilings of the same shape is sound. Set the winner via
LLAMA_INT4_TILING or fold it into _pick_tiling_default.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/llama_tpu_jax_cache")

    from llama_cu_awq_tpu.config import LLAMA2_7B, LLAMA2_13B
    from llama_cu_awq_tpu.models.llama import synthetic_params
    from llama_cu_awq_tpu.ops.pallas import int4_matmul as m

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b", choices=["7b", "13b"])
    args = ap.parse_args()
    cfg = LLAMA2_13B if args.config == "13b" else LLAMA2_7B

    params = synthetic_params(cfg, seed=0, tpu_layout=True)
    jax.block_until_ready(params.embed)
    layer = params.layers[0]

    def timeit(qt, x, iters=300):
        def loop(x0):
            def body(x, _):
                out = m.int4_matmul(x, qt)
                # scalar feedback: keeps the loop-carried dependency
                # without assuming n_out >= n_in (the old column slice
                # broke on contracting matmuls like 13B's down,
                # 13824 -> 5120)
                x = x * 0.999 + (jnp.sum(out) * 1e-9).astype(x.dtype)
                return x, None
            return lax.scan(body, x0, None, length=iters)[0]
        j = jax.jit(loop)
        jax.device_get(j(x))
        t0 = time.perf_counter()
        jax.device_get(j(x))
        return (time.perf_counter() - t0) / iters

    shapes = {
        "qkv": (layer.wqkv, jnp.ones((1, cfg.dim), jnp.bfloat16)),
        "o": (layer.wo, jnp.ones((1, cfg.dim), jnp.bfloat16)),
        "gate_up": (layer.w_gate_up, jnp.ones((1, cfg.dim), jnp.bfloat16)),
        "down": (layer.w_down, jnp.ones((1, cfg.hidden_dim), jnp.bfloat16)),
    }
    for name, (qt, x) in shapes.items():
        n_chunks = qt.n_pad // 512
        d_pad = qt.d_pad
        results = []
        # all 128-multiple divisors of d_pad in [1024, 4096]: 13B's
        # 5120/15360/27648-wide projections have non-power-of-2 tiles
        # (2560, 3072, 3456) the power-of-2 list never visits
        tiles = [t for t in range(1024, 4097, 128)
                 if d_pad % t == 0] or [d_pad]
        for tile_d in tiles:
            for chunks in (2, 4, 8):
                if n_chunks % chunks:
                    continue
                os.environ["LLAMA_INT4_TILING"] = f"{tile_d},{chunks}"
                # new tiling -> must retrace: clear jit caches
                m._int4_matmul_2d.clear_cache()
                try:
                    dt = timeit(qt, x)
                except Exception as e:
                    print(f"{name} tile_d={tile_d} chunks={chunks}: "
                          f"FAIL {type(e).__name__}", flush=True)
                    continue
                results.append((dt, tile_d, chunks))
                print(f"{name} tile_d={tile_d} chunks={chunks}: "
                      f"{dt*1e6:7.1f} us", flush=True)
        os.environ.pop("LLAMA_INT4_TILING", None)
        m._int4_matmul_2d.clear_cache()
        if results:
            best = min(results)
            print(f"--> {name} best: tile_d={best[1]} chunks={best[2]} "
                  f"({best[0]*1e6:.1f} us)\n", flush=True)


if __name__ == "__main__":
    main()
