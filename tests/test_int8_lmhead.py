"""Opt-in int8 lm_head (quant/int8.py + the dense_gemv int8 kernel
variant): quantization error bounds, kernel-vs-oracle parity, and an
engine run with the quantized head."""

import pytest
import jax.numpy as jnp
import numpy as np

from llama_cu_awq_tpu.models import (
    init_kv_cache,
    quantize_lm_head,
    synthetic_params,
)
from llama_cu_awq_tpu.ops.linear import dense_matmul
from llama_cu_awq_tpu.ops.pallas.dense_gemv import dense_gemv, supports
from llama_cu_awq_tpu.quant.int8 import Int8Dense, quantize_dense_int8
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN


def test_quantize_dense_int8_error_bound(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    q = quantize_dense_int8(w)
    err = np.abs(np.asarray(q.dequantize()) - np.asarray(w))
    bound = np.asarray(q.scale) / 2 + 1e-7
    assert (err <= bound).all()


def test_int8_gemv_kernel_matches_oracle(rng):
    v, d = 512, 256
    w = jnp.asarray(rng.normal(size=(v, d)), jnp.float32) * 0.1
    q = quantize_dense_int8(w)
    x = jnp.asarray(rng.normal(size=(2, d)), jnp.float32)
    assert supports(x, q.w8)
    got = dense_gemv(x.astype(jnp.bfloat16), q.w8, q.scale.reshape(1, -1),
                     interpret=True)
    want = dense_matmul(x.astype(jnp.bfloat16), q, impl="dequant")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


@pytest.mark.slow
def test_int8_lmhead_logits_close_to_bf16(tiny_config):
    from llama_cu_awq_tpu.models import forward

    cfg = tiny_config
    params = synthetic_params(cfg, seed=5, tpu_layout=False,
                              param_dtype=jnp.float32)
    qparams = quantize_lm_head(params)
    assert isinstance(qparams.lm_head, Int8Dense)
    tokens = jnp.asarray([[BOS_TOKEN, 5, 9]])
    pos = jnp.zeros(1, jnp.int32)
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    lo, _ = forward(params, cfg, tokens, pos, cache, attn_len=32,
                    act_dtype=jnp.float32, matmul_impl="dequant")
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    lo_q, _ = forward(qparams, cfg, tokens, pos, cache, attn_len=32,
                      act_dtype=jnp.float32, matmul_impl="dequant")
    a, b = np.asarray(lo), np.asarray(lo_q)
    # int8 per-row quantization: logits track within ~1% of their range
    assert np.abs(a - b).max() < 0.02 * np.abs(a).max() + 0.02


def test_engine_runs_with_int8_lmhead(tiny_config):
    from llama_cu_awq_tpu.engine import InferenceEngine

    cfg = tiny_config
    params = quantize_lm_head(
        synthetic_params(cfg, seed=5, tpu_layout=False,
                         param_dtype=jnp.float32))
    eng = InferenceEngine(params, cfg, act_dtype=jnp.float32,
                          matmul_impl="dequant", temperature=0.0,
                          max_seq=64, chunk_size=4)
    toks, _, _ = eng.generate_benchmark([BOS_TOKEN, 7, 9], 10)
    assert len(toks) >= 7


def test_int4_lmhead_logits_close(tiny_config, rng):
    """bits=4: w4-g128 lm_head served by the int4 matmul path."""
    from llama_cu_awq_tpu.models import forward
    from llama_cu_awq_tpu.quant.qtensor import QTensor

    cfg = tiny_config
    params = synthetic_params(cfg, seed=5, tpu_layout=False,
                              param_dtype=jnp.float32)
    q4 = quantize_lm_head(params, bits=4, tpu_layout=False)
    assert isinstance(q4.lm_head, QTensor)
    tokens = jnp.asarray([[BOS_TOKEN, 5, 9]])
    pos = jnp.zeros(1, jnp.int32)
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    lo, _ = forward(params, cfg, tokens, pos, cache, attn_len=32,
                    act_dtype=jnp.float32, matmul_impl="dequant")
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    lo_q, _ = forward(q4, cfg, tokens, pos, cache, attn_len=32,
                      act_dtype=jnp.float32, matmul_impl="dequant")
    a, b = np.asarray(lo), np.asarray(lo_q)
    # w4-g128: coarser than int8 but logits must still track closely
    assert np.abs(a - b).max() < 0.06 * np.abs(a).max() + 0.06


def test_engine_runs_with_int4_lmhead(tiny_config):
    from llama_cu_awq_tpu.engine import InferenceEngine

    cfg = tiny_config
    params = quantize_lm_head(
        synthetic_params(cfg, seed=5, tpu_layout=False,
                         param_dtype=jnp.float32), bits=4,
        tpu_layout=False)
    eng = InferenceEngine(params, cfg, act_dtype=jnp.float32,
                          matmul_impl="dequant", temperature=0.0,
                          max_seq=64, chunk_size=4)
    toks, _, _ = eng.generate_benchmark([BOS_TOKEN, 7, 9], 10)
    assert len(toks) >= 7
