from llama_cu_awq_tpu.models.llama import (
    KVCache,
    LlamaParams,
    forward,
    init_kv_cache,
    params_from_checkpoint,
    quantize_lm_head,
    synthetic_params,
)

__all__ = [
    "KVCache",
    "LlamaParams",
    "forward",
    "init_kv_cache",
    "params_from_checkpoint",
    "quantize_lm_head",
    "synthetic_params",
]
