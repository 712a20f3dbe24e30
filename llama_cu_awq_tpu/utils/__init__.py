from llama_cu_awq_tpu.utils.logging import get_logger, log_timing
from llama_cu_awq_tpu.utils.profiling import profile_trace
