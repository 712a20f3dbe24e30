from llama_cu_awq_tpu.engine.engine import InferenceEngine

__all__ = ["InferenceEngine"]
