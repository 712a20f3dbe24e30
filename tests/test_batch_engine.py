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


def greedy_reference(params, cfg, prompt, n_new, with_margins=False):
    eng = InferenceEngine(params, cfg, act_dtype=jnp.float32,
                          matmul_impl="dequant", temperature=0.0,
                          max_seq=96, chunk_size=4)
    tokens, _, _ = eng.generate_benchmark(prompt, len(prompt) + n_new)
    if not with_margins:
        return tokens[:n_new]
    # per-step argmax margins (top1 - top2 logit) along the greedy path,
    # via a straight forward() replay
    from llama_cu_awq_tpu.models import forward, init_kv_cache

    cache = init_kv_cache(cfg, 1, 96, dtype=jnp.float32)
    logits, cache = forward(params, cfg, jnp.asarray([prompt]),
                            jnp.zeros(1, jnp.int32), cache, attn_len=96,
                            act_dtype=jnp.float32, matmul_impl="dequant")
    margins = []
    pos = len(prompt)
    for t in tokens[:n_new]:
        arr = np.sort(np.asarray(logits[0]))
        margins.append(float(arr[-1] - arr[-2]))
        logits, cache = forward(params, cfg, jnp.asarray([[t]]),
                                jnp.asarray([pos], jnp.int32), cache,
                                attn_len=96, act_dtype=jnp.float32,
                                matmul_impl="dequant")
        pos += 1
    return tokens[:n_new], margins


def assert_greedy_stream(got, exp, margins, near_tie=6e-2):
    """Exact greedy parity, except a flip at a near-tie logit step is
    legitimate (different compiled programs + threaded CPU reductions
    reassociate; observed flips up to ~0.04 logit margin on random tiny
    models whose logit scale is ~5): the stream may diverge there, but a
    mismatch at a decisive-margin step is a real bug."""
    for i, (g, e) in enumerate(zip(got, exp)):
        if g != e:
            assert margins[i] < near_tie, (
                f"streams diverged at step {i} ({g} != {e}) where the "
                f"argmax margin was decisive ({margins[i]:.4f})")
            return
    assert len(got) >= 1


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
    expected = [greedy_reference(params, cfg, p, n_new, with_margins=True)
                for p in prompts]

    # 3 slots for 5 requests: exercises queueing + slot reuse
    be = BatchEngine(params, cfg, n_slots=3, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=prefer_native)
    rids = [be.submit(p, max_new=n_new) for p in prompts]
    out = be.run()
    assert be.scheduler.num_active == 0 and be.scheduler.num_queued == 0
    for rid, (exp, margins) in zip(rids, expected):
        assert_greedy_stream(out[rid], exp, margins)
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
    e1, m1 = greedy_reference(params, cfg, [BOS_TOKEN, 5, 9, 100], 6,
                              with_margins=True)
    e2, m2 = greedy_reference(params, cfg, [BOS_TOKEN, 42], 6,
                              with_margins=True)
    assert_greedy_stream(out[r1], e1, m1)
    assert_greedy_stream(out[r2], e2, m2)


def test_long_prompt_block_prefill_path(tiny_model):
    """Prompts over FORCED_PROMPT_MAX take the dedicated block-prefill
    admission path; greedy output must still match the single engine."""
    params, cfg = tiny_model
    prompt = [BOS_TOKEN] + [(17 * i) % 500 for i in range(60)]
    n_new = 6
    expected, margins = greedy_reference(params, cfg, prompt, n_new,
                                         with_margins=True)
    be = BatchEngine(params, cfg, n_slots=2, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=False)
    assert len(prompt) > be.FORCED_PROMPT_MAX
    rid = be.submit(prompt, max_new=n_new)
    rid2 = be.submit([BOS_TOKEN, 42], max_new=n_new)  # mixed with short
    out = be.run()
    assert_greedy_stream(out[rid], expected, margins)
    e2, m2 = greedy_reference(params, cfg, [BOS_TOKEN, 42], n_new,
                              with_margins=True)
    assert_greedy_stream(out[rid2], e2, m2)


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
