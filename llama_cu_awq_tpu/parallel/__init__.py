from llama_cu_awq_tpu.parallel.mesh import make_mesh
from llama_cu_awq_tpu.parallel.multihost import (
    init_multihost,
    is_coordinator,
    place_params_global,
    pod_mesh,
    put_global,
)
from llama_cu_awq_tpu.parallel.tp import (
    make_shard_forward,
    make_tp_forward,
    place_params,
    tp_cache_sharding,
    tp_init_kv_cache,
    tp_param_shardings,
    tp_params_from_checkpoint,
    tp_synthetic_params,
)

__all__ = [
    "init_multihost",
    "is_coordinator",
    "make_mesh",
    "pod_mesh",
    "make_shard_forward",
    "make_tp_forward",
    "place_params",
    "tp_cache_sharding",
    "tp_init_kv_cache",
    "tp_param_shardings",
    "tp_params_from_checkpoint",
    "tp_synthetic_params",
]
