"""Prompt-prefix KV caching on serving admission (engine/batch.py
_PrefixCache): identical long prefixes admit with a device row copy
instead of a re-prefill; the copied rows are exact (causal rows depend
only on earlier tokens), so streams must be unchanged.
"""

import jax.numpy as jnp
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine.batch import BatchEngine, _PrefixCache
from llama_cu_awq_tpu.engine.engine import PREFILL_BLOCK
from llama_cu_awq_tpu.models import synthetic_params
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

from tests.test_batch_engine import assert_greedy_consistent


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=256, seq_len=512)
    params = synthetic_params(cfg, seed=4, tpu_layout=False,
                              param_dtype=jnp.float32)
    return params, cfg


LONG = [BOS_TOKEN] + [(7 + 3 * i) % 200 for i in range(PREFILL_BLOCK + 40)]


def make(params, cfg, **kw):
    kw.setdefault("n_slots", 2)
    kw.setdefault("max_seq", 256)
    kw.setdefault("act_dtype", jnp.float32)
    kw.setdefault("matmul_impl", "dequant")
    kw.setdefault("temperature", 0.0)
    kw.setdefault("chunk_size", 4)
    return BatchEngine(params, cfg, **kw)


def test_lru_match_and_evict():
    pc = _PrefixCache(2)
    a = list(range(PREFILL_BLOCK * 2))
    b = list(range(1000, 1000 + PREFILL_BLOCK))
    c = list(range(2000, 2000 + PREFILL_BLOCK))
    assert pc.match(a) == 0  # miss
    pc.put(a, PREFILL_BLOCK * 2, "A")
    # exact-length and longer prompts both match; block granularity
    assert pc.match(a) == PREFILL_BLOCK * 2
    assert pc.match(a + [5, 6]) == PREFILL_BLOCK * 2
    # a shorter prompt sharing the first block does NOT match the
    # 2-block entry (keys are exact prefixes)
    assert pc.match(a[:PREFILL_BLOCK + 10]) == 0
    pc.put(b, PREFILL_BLOCK, "B")
    pc.put(c, PREFILL_BLOCK, "C")  # evicts the LRU entry
    assert len(pc._entries) == 2
    assert pc.match(b) == PREFILL_BLOCK  # B stayed (A was LRU)
    assert pc.match(c) == PREFILL_BLOCK


def _snap_rows(be, n):
    import numpy as np

    rows = [np.asarray(x[0][:n]).copy()
            for x in (be.cache.k + be.cache.v)]
    rows += [np.asarray(x[0][:n]).copy()
             for x in (list(be.cache.k_scale) + list(be.cache.v_scale))]
    return rows


@pytest.mark.parametrize("kv_quant", [False, True])
def test_prefix_hit_rows_exact(model, kv_quant):
    """Second request with the same long prompt: admission must hit the
    cache, and the admitted KV rows must be BIT-IDENTICAL to the cold
    prefill's (the feature's exactness property — rows of a causal
    model depend only on earlier tokens). Streams are checked with the
    greedy-consistency replay, not bit-equality: under load this CPU
    backend's threaded reductions flip near-tie argmaxes per launch,
    unrelated to the cache (probed: flips occur with plain
    reset+resubmit and no prefix cache at all)."""
    import numpy as np

    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = model
    act = jnp.float32 if not kv_quant else jnp.bfloat16

    def scenario():
        be = make(params, cfg, prefix_cache_size=2, kv_quant=kv_quant,
                  act_dtype=act)
        n = len(LONG) - 1
        r1 = be.submit(LONG, max_new=8)
        be._admit()
        be._advance_prefill()  # drain the interleaved prefill job
        cold = _snap_rows(be, n)
        out1 = be.run()[r1]
        assert be.prefix_cache.hits == 0 and be.prefix_cache.misses == 1
        assert len(be.prefix_cache._entries) == 1
        be.reset()  # keeps the prefix cache (rows only need weights)
        r2 = be.submit(LONG, max_new=8)
        be._admit()
        be._advance_prefill()  # hit copies rows; job prefills the tail
        warm = _snap_rows(be, n)
        out2 = be.run()[r2]
        assert be.prefix_cache.hits == 1
        assert be.prefix_cache.rows_saved == PREFILL_BLOCK
        for a, b in zip(cold, warm):
            assert np.array_equal(a, b)
        for out in (out1, out2):
            assert len(out) == 8
            if not kv_quant:
                assert_greedy_consistent(params, cfg, LONG, out,
                                         max_seq=256, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_multiturn_extension_hits(model):
    """Chat pattern: turn 2's prompt extends turn 1's. The stored
    prefix (block-multiple of turn 1) must be reused, and the longer
    prompt's own longer prefix stored."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = model

    def scenario():
        be = make(params, cfg, prefix_cache_size=4, max_seq=512)
        r1 = be.submit(LONG, max_new=6)
        out1 = be.run()[r1]
        turn2 = (LONG + out1
                 + [(11 * i) % 200 for i in range(PREFILL_BLOCK)])
        be.reset()
        r2 = be.submit(turn2, max_new=6)
        out2 = be.run()[r2]
        assert be.prefix_cache.hits == 1         # turn 1 prefix reused
        assert len(be.prefix_cache._entries) == 2  # longer one stored
        assert len(out2) == 6
        assert_greedy_consistent(params, cfg, turn2, out2, max_seq=512,
                                 tol=2e-1)
        # third request repeats turn 2 exactly: hits the LONGER entry
        be.reset()
        r3 = be.submit(turn2, max_new=6)
        out3 = be.run()[r3]
        assert be.prefix_cache.hits == 2
        assert_greedy_consistent(params, cfg, turn2, out3, max_seq=512,
                                 tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


def test_disabled_by_default(model):
    params, cfg = model
    be = make(params, cfg)
    assert be.prefix_cache is None
    rid = be.submit(LONG, max_new=4)
    assert len(be.run()[rid]) == 4


def test_prefix_cache_composes_with_spec(model):
    """Spec serving + prefix cache together: the second identical-prefix
    request admits via a row copy (pos starts past the cached rows) and
    spec blocks then run on top of it; the stream stays greedy. This is
    the hot serving combo (shared system prompt + speculative decode)."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4,
                  prefix_cache_size=2)
        r0 = be.submit(LONG, max_new=8)
        out0 = be.run()
        assert be.prefix_cache.hits == 0
        r1 = be.submit(LONG + [11, 12], max_new=8)
        out1 = be.run()
        assert be.prefix_cache.hits == 1
        assert be.prefix_cache.rows_saved >= PREFILL_BLOCK
        assert be.spec_stats["blocks"] > 0
        assert len(out0[r0]) == 8 and len(out1[r1]) == 8
        assert_greedy_consistent(params, cfg, LONG, out0[r0],
                                 max_seq=256, tol=2e-1)
        assert_greedy_consistent(params, cfg, LONG + [11, 12], out1[r1],
                                 max_seq=256, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)
