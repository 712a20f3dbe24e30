"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU-native answer to "fake backends" (SURVEY.md §4): Mesh/
pjit/shard_map/collectives run on N forced host devices in one process,
so multi-chip sharding logic is exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_multi_thread_eigen" not in flags:
    # deterministic f32 reductions: threaded split-K dots flip near-tie
    # greedy argmaxes between runs, making exact-stream parity tests flaky
    flags += " --xla_cpu_multi_thread_eigen=false"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# The axon sitecustomize forces JAX_PLATFORMS=axon (the real TPU tunnel);
# override it so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TOKENIZER = "/root/reference/tokenizer.bin"


def pytest_collection_modifyitems(items):
    # two tiers (VERDICT r4 item 7): `pytest -m quick` (< 5 min, every
    # module represented) and the full suite. quick == "not slow", but
    # both spellings work.
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def tiny_config():
    from llama_cu_awq_tpu.config import ModelConfig

    # dims chosen small but multiple-of-8 (matmul size gate, llama2_q4.cu:215)
    # and with GQA (n_kv_heads < n_heads) to cover the kv_mul path.
    return ModelConfig(dim=64, hidden_dim=160, n_layers=3, n_heads=4,
                       n_kv_heads=2, vocab_size=512, seq_len=96,
                       rope_theta=10000.0)


@pytest.fixture
def tiny_mha_config():
    from llama_cu_awq_tpu.config import ModelConfig

    # n_heads == n_kv_heads exercises the reference's fused-qkv dispatch path
    # (llama2_q4.cu:306-313).
    return ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4,
                       n_kv_heads=4, vocab_size=256, seq_len=64,
                       rope_theta=50000.0)
