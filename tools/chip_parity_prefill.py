#!/usr/bin/env python
"""On-chip numeric parity of the prefill flash kernel vs the einsum
path (interpret-mode tests cannot catch a Mosaic miscompile —
promotion requires on-chip proof, same bar as tools/chip_parity.py).

Runs a T=256 teacher-forced block at 7B shapes through forward() twice
(LLAMA_TPU_PREFILL_ATTN=pallas / einsum) and compares logits_all
outputs and the written caches.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/llama_tpu_jax_cache")
    from llama_cu_awq_tpu.config import LLAMA2_7B
    from llama_cu_awq_tpu.models import forward, init_kv_cache, synthetic_params

    cfg = LLAMA2_7B
    params = synthetic_params(cfg, seed=0)
    B, T, A = 1, 256, 512
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(5, 30000, (B, T)), jnp.int32)
    pos = jnp.asarray([128] * B, jnp.int32)  # mid-window block

    # T=256 matmul output rows need the prefill-grade scoped-vmem pool
    # (the engines set this per-step; raw forward() needs it here too)
    opts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}

    def jit_fwd(**kw):
        return jax.jit(
            lambda p, t, po, c: forward(p, cfg, t, po, c, attn_len=A,
                                        **kw),
            compiler_options=opts)

    ok = True
    for quant in (False, True):
        outs = {}
        for impl in ("einsum", "pallas"):
            os.environ["LLAMA_TPU_PREFILL_ATTN"] = impl
            cache = init_kv_cache(cfg, B, A, quantized=quant)
            # prime rows 0-127 so the history path is exercised
            warm = jnp.asarray(rng.integers(5, 30000, (B, 128)), jnp.int32)
            _, cache = jit_fwd(no_logits=True)(params, warm,
                                               jnp.zeros(B, jnp.int32),
                                               cache)
            logits, cache = jit_fwd(logits_all=True)(params, tok, pos,
                                                     cache)
            outs[impl] = np.asarray(logits, np.float32)
        d = np.abs(outs["pallas"] - outs["einsum"])
        rel = d.max() / max(np.abs(outs["einsum"]).max(), 1e-9)
        print(f"quant={quant}: max abs diff {d.max():.5f}, rel "
              f"{rel:.5f}, einsum amax "
              f"{np.abs(outs['einsum']).max():.3f}")
        if rel > 0.03:
            ok = False
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
