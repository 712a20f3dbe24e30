from llama_cu_awq_tpu.quant.packing import (
    pack_nibbles,
    unpack_nibbles,
    packed_weight_height,
    dequantize_np,
)
from llama_cu_awq_tpu.quant.qtensor import QTensor

__all__ = [
    "pack_nibbles",
    "unpack_nibbles",
    "packed_weight_height",
    "dequantize_np",
    "QTensor",
]
