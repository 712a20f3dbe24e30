import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import (
    forward,
    init_kv_cache,
    params_from_checkpoint,
    synthetic_params,
)
from tests.reference_numpy import numpy_forward


def _prefill_logits(ckpt, tokens, **kw):
    params = params_from_checkpoint(ckpt)
    cfg = ckpt.config
    cache = init_kv_cache(cfg, 1, cfg.seq_len, dtype=jnp.float32)
    logits, _ = forward(
        params, cfg, jnp.asarray([tokens]), jnp.zeros(1, jnp.int32), cache,
        act_dtype=jnp.float32, matmul_impl="dequant", logits_all=True, **kw)
    return np.asarray(logits[0])


@pytest.mark.parametrize("fixture", ["tiny_config", "tiny_mha_config"])
def test_forward_matches_numpy_oracle(request, fixture, rng):
    cfg = request.getfixturevalue(fixture)
    ckpt = random_checkpoint(cfg, seed=11)
    tokens = rng.integers(0, cfg.vocab_size, size=12).tolist()
    ours = _prefill_logits(ckpt, tokens)
    oracle = numpy_forward(ckpt, tokens)
    assert ours.shape == oracle.shape
    # both are f32; differences are accumulation-order only
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=3e-4)


@pytest.mark.slow
def test_decode_matches_prefill(tiny_config, rng):
    """Feeding tokens one at a time through the KV cache must reproduce
    the batched prefill logits (teacher-forced consistency)."""
    cfg = tiny_config
    ckpt = random_checkpoint(cfg, seed=5)
    params = params_from_checkpoint(ckpt)
    tokens = rng.integers(0, cfg.vocab_size, size=9).tolist()

    all_logits = _prefill_logits(ckpt, tokens)

    cache = init_kv_cache(cfg, 1, cfg.seq_len, dtype=jnp.float32)
    step_logits = []
    for t, tok in enumerate(tokens):
        logits, cache = forward(
            params, cfg, jnp.asarray([[tok]]),
            jnp.asarray([t], jnp.int32), cache,
            act_dtype=jnp.float32, matmul_impl="dequant")
        step_logits.append(np.asarray(logits[0]))
    np.testing.assert_allclose(np.stack(step_logits), all_logits,
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_attn_len_bucketing_invariant(tiny_config, rng):
    """Attention window bucket (the jit analog of CUDA-graph seq bins)
    must not change results as long as it covers pos+T."""
    cfg = tiny_config
    ckpt = random_checkpoint(cfg, seed=8)
    params = params_from_checkpoint(ckpt)
    tokens = rng.integers(0, cfg.vocab_size, size=7)
    cache = init_kv_cache(cfg, 1, cfg.seq_len, dtype=jnp.float32)
    args = (params, cfg, jnp.asarray([tokens.tolist()]),
            jnp.zeros(1, jnp.int32), cache)
    l_full, _ = forward(*args, act_dtype=jnp.float32, matmul_impl="dequant")
    l_bucket, _ = forward(*args, attn_len=16, act_dtype=jnp.float32,
                          matmul_impl="dequant")
    np.testing.assert_allclose(np.asarray(l_full), np.asarray(l_bucket),
                               rtol=1e-6)


@pytest.mark.slow
def test_batched_prefill_independent_sequences(tiny_config, rng):
    """Batch dimension must not leak between sequences."""
    cfg = tiny_config
    ckpt = random_checkpoint(cfg, seed=2)
    params = params_from_checkpoint(ckpt)
    t1 = rng.integers(0, cfg.vocab_size, size=6).tolist()
    t2 = rng.integers(0, cfg.vocab_size, size=6).tolist()

    cache = init_kv_cache(cfg, 2, cfg.seq_len, dtype=jnp.float32)
    both, _ = forward(params, cfg, jnp.asarray([t1, t2]),
                      jnp.zeros(2, jnp.int32), cache,
                      act_dtype=jnp.float32, matmul_impl="dequant",
                      logits_all=True)
    solo = _prefill_logits(ckpt, t2)
    np.testing.assert_allclose(np.asarray(both[1]), solo, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow
def test_synthetic_params_forward_runs(tiny_config):
    params = synthetic_params(tiny_config, seed=0)
    cfg = tiny_config
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.bfloat16)
    logits, cache2 = forward(params, cfg, jnp.asarray([[1, 2, 3]]),
                             jnp.zeros(1, jnp.int32), cache,
                             matmul_impl="dequant")
    assert logits.shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert len(cache2.k) == len(cache.k)
    assert cache2.k[0].shape == cache.k[0].shape
