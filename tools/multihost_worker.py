#!/usr/bin/env python
"""Multi-host worker: one process of an N-process (dp over DCN, tp over
ICI) decode run, used by tests/test_multihost.py as a subprocess pair on
localhost and runnable as-is on a real multi-host TPU slice (drop the
--cpu-devices flag; jax.distributed.initialize autodetects there).

Each process: joins the coordination service (parallel.init_multihost),
builds the (dp, tp) pod mesh, loads the SAME tiny random checkpoint
(seeded — the multi-host contract is every host reads the checkpoint
itself), places TP-layout params + dp-sharded inputs as global arrays,
and runs a teacher-forced decode loop threading the kv-head-sharded
cache through the jitted shard_map step. Prints a replicated logits
checksum that the test compares against a single-process run of the
same model (numerical agreement across the DCN boundary).

The reference has no distributed story at all (SURVEY.md §2.4); this is
the BASELINE.json multi-host capability path.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import sys


def build_model_inputs(n_steps: int, batch: int):
    """Deterministic teacher-forced token stream (identical everywhere)."""
    import numpy as np

    rng = np.random.default_rng(99)
    return rng.integers(4, 900, size=(n_steps, batch)).astype(np.int32)


TINY = dict(dim=256, hidden_dim=512, n_layers=2, n_heads=2, n_kv_heads=2,
            vocab_size=1024, seq_len=64)


def run_single(n_steps: int, batch: int) -> float:
    """Single-process oracle: same model, plain forward on one device."""
    import jax
    import jax.numpy as jnp

    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.models import (
        forward,
        init_kv_cache,
        params_from_checkpoint,
    )

    cfg = ModelConfig(**TINY)
    params = params_from_checkpoint(random_checkpoint(cfg, seed=5),
                                    param_dtype=jnp.bfloat16)
    cache = init_kv_cache(cfg, batch, 32)
    toks = build_model_inputs(n_steps, batch)
    ck = 0.0
    for i in range(n_steps):
        logits, cache = forward(params, cfg, jnp.asarray(toks[i][:, None]),
                                jnp.full((batch,), i, jnp.int32), cache,
                                attn_len=32)
        ck = float(jnp.sum(logits.astype(jnp.float32)))
    return ck


def run_worker(args) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    from llama_cu_awq_tpu.parallel import init_multihost, pod_mesh

    init_multihost(coordinator_address=f"localhost:{args.port}",
                   num_processes=args.nprocs, process_id=args.pid)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.parallel import (
        make_tp_forward,
        place_params_global,
        put_global,
    )
    from llama_cu_awq_tpu.parallel.tp import (
        tp_init_kv_cache,
        tp_params_from_checkpoint,
    )

    tp = args.cpu_devices or jax.local_device_count()
    mesh = pod_mesh(tp=tp)
    dp = mesh.shape["dp"]
    assert dp == args.nprocs, (dict(mesh.shape), args.nprocs)

    cfg = ModelConfig(**TINY)
    batch = args.batch
    assert batch % dp == 0
    host_params = tp_params_from_checkpoint(random_checkpoint(cfg, seed=5),
                                            tp)
    params = place_params_global(host_params, cfg, mesh)
    cache = tp_init_kv_cache(cfg, batch, 32, mesh, batch_sharded=True)
    fwd = make_tp_forward(cfg, mesh, attn_len=32, batch_sharded=True)

    dp_sh = NamedSharding(mesh, P("dp"))
    toks = build_model_inputs(args.steps, batch)
    ck = None
    checksum = jax.jit(lambda l: jnp.sum(l.astype(jnp.float32)),
                       out_shardings=NamedSharding(mesh, P()))
    for i in range(args.steps):
        tokens = put_global(toks[i][:, None],
                            NamedSharding(mesh, P("dp", None)))
        pos = put_global([i] * batch, dp_sh)
        logits, cache = fwd(params, tokens, pos, cache)
        ck = float(checksum(logits))
    return ck


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["worker", "single"], default="worker")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=29400)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="virtual CPU devices per process (tests); 0 = "
                         "real local devices (TPU pod)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    if args.role == "single":
        import jax

        jax.config.update("jax_platforms", "cpu")
        ck = run_single(args.steps, args.batch)
    else:
        ck = run_worker(args)
    print(f"CHECKSUM {ck:.6f}", flush=True)
    print("MULTIHOST OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
