"""TPU-native INT4 AWQ inference engine for Llama-2 models.

A brand-new JAX/XLA/Pallas framework with the capabilities of the CUDA
reference engine `ankan-ban/llama_cu_awq` (see /root/reference): batch-1
fused dequant+GEMV decode over w4-g128 AWQ weights, fp16/bf16 KV cache,
GQA attention with RoPE, on-device greedy and temperature/top-p sampling,
llama2.c-format BPE tokenizer, generate/chat/perplexity modes, and the
same packed `.bin` checkpoint format — plus TPU-first extensions the
reference lacks: tensor-parallel sharding over an ICI mesh and
continuous batching.
"""

from llama_cu_awq_tpu.config import ModelConfig

__version__ = "0.1.0"

__all__ = ["ModelConfig", "__version__"]
