"""Multi-host bring-up helpers (SURVEY.md §5 failure-detection row and
§2.4: DCN data path for serving across hosts).

The reference is strictly single-process (SURVEY.md §2.4); on TPU pods
the runtime story is: every host runs the same program,
`jax.distributed.initialize` forms the barrier/coordination service,
`jax.devices()` then spans the whole slice, and a (dp, tp) Mesh maps dp
to DCN (hosts) and tp to ICI (chips within a host) — mesh.make_mesh
already orders devices hosts-outermost so that factorization is exactly
`make_mesh(tp=chips_per_host, dp=n_hosts)`.

Serving layout: ONE BatchEngine per dp replica group (tp-sharded within
it via `mesh=`), with requests load-balanced across hosts by any
front-end; KV slots never cross the DCN boundary, so serving scales
linearly in hosts minus only the request-routing overhead. For
data-parallel BATCHED STEPS inside one program instead, use
make_tp_forward(batch_sharded=True) — slots shard over dp and each
host computes its rows (validated on the virtual mesh by
__graft_entry__.dryrun_multichip and tests/test_tp.py).
"""

from __future__ import annotations

import jax

from llama_cu_awq_tpu.parallel.mesh import make_mesh


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join the JAX distributed service (no-op when single-process).

    On Cloud TPU pods all arguments auto-detect from the metadata
    server; pass them explicitly elsewhere. Must run before any other
    JAX call. Fail-fast semantics (the reference's error model): any
    mismatch raises instead of hanging.
    """
    if num_processes == 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(tp: int | None = None):
    """(dp, tp) mesh over the full slice: tp defaults to the chips of
    one host (ICI domain), dp to the host count (DCN)."""
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    tp = tp or n_local
    return make_mesh(tp=tp, dp=n_total // tp)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def put_global(x, sharding):
    """Place host data (identical on every process) as a global jax.Array
    over a possibly multi-process mesh.

    jax.device_put of a host array onto a non-fully-addressable sharding
    is version-sensitive; make_array_from_callback only ever asks each
    process for the global slices of ITS addressable shards, which is
    exactly the multi-host contract (every host holds the same logical
    array, e.g. a checkpoint it read itself).
    """
    import numpy as np

    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def place_params_global(params, cfg, mesh):
    """Multi-host analog of parallel.tp.place_params: every process holds
    the same host-side TP-layout params (each read the checkpoint) and
    contributes its local shards."""
    from llama_cu_awq_tpu.parallel.tp import tp_param_shardings

    sh = tp_param_shardings(cfg, mesh)
    p_leaves, p_def = jax.tree.flatten(params)
    s_leaves = jax.tree.leaves(sh)
    placed = [put_global(x, s) for x, s in zip(p_leaves, s_leaves)]
    return jax.tree.unflatten(p_def, placed)
