"""Continuous-batching engine tests (CPU, tiny model).

The correctness anchor: every request served by the batched engine must
produce exactly the greedy token stream the single-sequence engine
produces for the same prompt — slots are causally independent inside the
shared batched step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.engine import InferenceEngine
from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import params_from_checkpoint
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN


@pytest.fixture(scope="module")
def tiny_model():
    from llama_cu_awq_tpu.config import ModelConfig

    cfg = ModelConfig(dim=64, hidden_dim=160, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=512, seq_len=96)
    ckpt = random_checkpoint(cfg, seed=7)
    params = params_from_checkpoint(ckpt, param_dtype=jnp.float32)
    return params, cfg


def greedy_reference(params, cfg, prompt, n_new):
    eng = InferenceEngine(params, cfg, act_dtype=jnp.float32,
                          matmul_impl="dequant", temperature=0.0,
                          max_seq=96, chunk_size=4)
    tokens, _, _ = eng.generate_benchmark(prompt, len(prompt) + n_new)
    return tokens[:n_new]


@pytest.mark.parametrize("prefer_native", [False, True])
def test_batched_matches_single_engine(tiny_model, prefer_native):
    params, cfg = tiny_model
    prompts = [
        [BOS_TOKEN, 5, 9, 100],
        [BOS_TOKEN, 42],
        [BOS_TOKEN, 7, 8, 9, 10, 11, 12],
        [BOS_TOKEN, 301, 17, 4],
        [BOS_TOKEN, 250],
    ]
    n_new = 12
    expected = [greedy_reference(params, cfg, p, n_new) for p in prompts]

    # 3 slots for 5 requests: exercises queueing + slot reuse
    be = BatchEngine(params, cfg, n_slots=3, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=prefer_native)
    rids = [be.submit(p, max_new=n_new) for p in prompts]
    out = be.run()
    assert be.scheduler.num_active == 0 and be.scheduler.num_queued == 0
    for rid, exp in zip(rids, expected):
        got = out[rid]
        # EOS (if sampled) ends the stream early in both engines
        assert got == exp[:len(got)] and len(got) >= min(len(exp), 1), \
            (rid, got, exp)
        assert got == [t for t in exp[:n_new]][:len(got)]
    stats = be.stats()
    assert stats["finished"] == len(prompts)
    assert stats["total_tokens"] == sum(len(out[r]) for r in rids)


def test_single_slot_degenerates_to_sequential(tiny_model):
    params, cfg = tiny_model
    be = BatchEngine(params, cfg, n_slots=1, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=False)
    r1 = be.submit([BOS_TOKEN, 5, 9, 100], max_new=6)
    r2 = be.submit([BOS_TOKEN, 42], max_new=6)
    out = be.run()
    assert out[r1] == greedy_reference(params, cfg, [BOS_TOKEN, 5, 9, 100],
                                       6)[:len(out[r1])]
    assert out[r2] == greedy_reference(params, cfg, [BOS_TOKEN, 42],
                                       6)[:len(out[r2])]


def test_long_prompt_block_prefill_path(tiny_model):
    """Prompts over FORCED_PROMPT_MAX take the dedicated block-prefill
    admission path; greedy output must still match the single engine."""
    params, cfg = tiny_model
    prompt = [BOS_TOKEN] + [(17 * i) % 500 for i in range(60)]
    n_new = 6
    expected = greedy_reference(params, cfg, prompt, n_new)
    be = BatchEngine(params, cfg, n_slots=2, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=False)
    assert len(prompt) > be.FORCED_PROMPT_MAX
    rid = be.submit(prompt, max_new=n_new)
    rid2 = be.submit([BOS_TOKEN, 42], max_new=n_new)  # mixed with short
    out = be.run()
    assert out[rid] == expected[:len(out[rid])] and out[rid]
    assert out[rid2] == greedy_reference(params, cfg, [BOS_TOKEN, 42],
                                         n_new)[:len(out[rid2])]


def test_capacity_cutoff(tiny_model):
    """A request near the cache boundary stops at max_seq."""
    params, cfg = tiny_model
    be = BatchEngine(params, cfg, n_slots=2, max_seq=16,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=False)
    prompt = [BOS_TOKEN] + list(range(5, 16))  # 12 tokens, room for 4
    rid = be.submit(prompt, max_new=0)
    out = be.run()
    assert len(out[rid]) <= 16 - len(prompt)
    assert be.scheduler.num_active == 0


def test_oversized_prompt_rejected(tiny_model):
    params, cfg = tiny_model
    be = BatchEngine(params, cfg, n_slots=1, max_seq=8,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     prefer_native_scheduler=False)
    with pytest.raises(ValueError):
        be.submit([BOS_TOKEN] + list(range(5, 13)), max_new=1)
