from llama_cu_awq_tpu.ops.linear import qmatmul, set_default_matmul_impl
from llama_cu_awq_tpu.ops.norms import rmsnorm
from llama_cu_awq_tpu.ops.rope import apply_rope

__all__ = ["qmatmul", "set_default_matmul_impl", "rmsnorm", "apply_rope"]
