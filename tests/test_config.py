import pytest

from llama_cu_awq_tpu.config import HEADER_BYTES, LLAMA2_7B, ModelConfig


def test_header_roundtrip():
    cfg = ModelConfig(4096, 11008, 32, 32, 32, 32000, 2048, 1e6)
    raw = cfg.to_header()
    assert len(raw) == HEADER_BYTES == 32
    assert ModelConfig.from_header(raw) == cfg


def test_header_rejects_short():
    with pytest.raises(ValueError):
        ModelConfig.from_header(b"\x00" * 8)


def test_derived_dims():
    cfg = ModelConfig(64, 160, 2, 4, 2, 512, 128)
    assert cfg.head_dim == 16
    assert cfg.kv_dim == 32
    assert cfg.kv_mul == 2


def test_hf_json_defaults():
    js = """{"hidden_size": 4096, "intermediate_size": 11008,
             "num_hidden_layers": 32, "num_attention_heads": 32,
             "vocab_size": 32000, "max_position_embeddings": 4096}"""
    cfg = ModelConfig.from_hf_json(js)
    assert cfg == LLAMA2_7B  # kv heads default to n_heads, theta to 1e4
    assert cfg.rope_theta == 10000.0


def test_invalid_config_rejected():
    with pytest.raises(ValueError):
        ModelConfig(65, 160, 2, 4, 2, 512, 128)  # dim % n_heads != 0
    with pytest.raises(ValueError):
        ModelConfig(64, 160, 2, 4, 3, 512, 128)  # n_heads % n_kv_heads != 0
