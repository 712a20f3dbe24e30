from llama_cu_awq_tpu.models.llama import (
    KVCache,
    LlamaParams,
    forward,
    init_kv_cache,
    params_from_checkpoint,
    synthetic_params,
)

__all__ = [
    "KVCache",
    "LlamaParams",
    "forward",
    "init_kv_cache",
    "params_from_checkpoint",
    "synthetic_params",
]
