"""Serving speculative decoding: BatchEngine spec='ngram' blocks.

The (S, T) teacher-forced block unifies prompt feeding, prompt-lookup
proposals, and plain decode in one weight pass per round; every
emitted token is the slot's exact greedy token (accepted prefix +
correction), so outputs must match the plain engine's streams up to
near-tie argmax jitter — checked with the greedy-consistency replay
from test_batch_engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.models import synthetic_params
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

from tests.test_batch_engine import assert_greedy_consistent


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=256, seq_len=128)
    params = synthetic_params(cfg, seed=4, tpu_layout=False,
                              param_dtype=jnp.float32)
    return params, cfg


def make(params, cfg, **kw):
    kw.setdefault("n_slots", 3)
    kw.setdefault("max_seq", 96)
    kw.setdefault("act_dtype", jnp.float32)
    kw.setdefault("matmul_impl", "dequant")
    kw.setdefault("temperature", 0.0)
    kw.setdefault("chunk_size", 4)
    return BatchEngine(params, cfg, **kw)


PROMPTS = [
    [BOS_TOKEN, 5, 9, 100],
    [BOS_TOKEN, 42],
    [BOS_TOKEN, 7, 8, 9, 10, 11, 12],
    [BOS_TOKEN, 301 % 256, 17, 4],
    [BOS_TOKEN, 250],
]


@pytest.mark.slow
def test_spec_blocks_match_greedy(tiny_model):
    """5 requests over 3 slots, spec blocks: every stream must be
    greedy-consistent, acceptance must actually happen (the random
    tiny model loops), and slot reuse must work. retry: the throttle
    can route rounds through the scan-chunk executable, which carries
    the CPU backend's per-compile lottery."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        rids = [be.submit(p, max_new=12) for p in PROMPTS]
        out = be.run()
        assert (be.scheduler.num_active == 0
                and be.scheduler.num_queued == 0)
        for rid, p in zip(rids, PROMPTS):
            assert len(out[rid]) == 12
            assert_greedy_consistent(params, cfg, p, out[rid], tol=2e-1)
        assert be.spec_stats["blocks"] > 0
        assert be.spec_stats["accepted"] > 0
        st = be.stats()
        assert st["finished"] == 5 and "spec" in st

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_spec_matches_plain_engine_streams(tiny_model):
    """Per-request streams equal the non-spec engine's (exact on this
    model/seed; greedy-consistency is the fallback oracle if a
    near-tie flip ever appears). retry_compile_lottery: a lottery
    executable computes streams ~0.25 logits off the oracle —
    deterministic per compile, gone on a fresh one."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model

    def scenario():
        plain = make(params, cfg)
        plain_rids = [plain.submit(p, max_new=10) for p in PROMPTS]
        base = plain.run()
        be = make(params, cfg, spec="ngram", spec_k=4)
        rids = [be.submit(p, max_new=10) for p in PROMPTS]
        got = be.run()
        for rp, rs, p in zip(plain_rids, rids, PROMPTS):
            if got[rs] != base[rp]:
                assert_greedy_consistent(params, cfg, p, got[rs],
                                         tol=2e-1)
                assert_greedy_consistent(params, cfg, p, base[rp],
                                         tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_spec_long_prompt_block_prefill(tiny_model):
    """A prompt longer than FORCED_PROMPT_MAX takes the dedicated
    block-prefill path, then speculates; stream stays greedy."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model
    long_prompt = [BOS_TOKEN] + [(3 + i) % 200 for i in range(60)]

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        rid = be.submit(long_prompt, max_new=8)
        out = be.run()
        assert len(out[rid]) == 8
        assert_greedy_consistent(params, cfg, long_prompt, out[rid],
                                 max_seq=96, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_spec_mixed_sampled_and_greedy_rides_blocks(tiny_model):
    """A temperature>0 request shares spec blocks with greedy slots
    (point-mass-draft rejection sampling): both finish, blocks run, and
    the greedy slot's stream is still exactly greedy-consistent."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        r0 = be.submit(PROMPTS[0], max_new=8)                   # greedy
        r1 = be.submit(PROMPTS[1], max_new=8, temperature=0.8)  # sampled
        out = be.run()
        assert len(out[r0]) == 8 and len(out[r1]) == 8
        assert be.spec_stats["blocks"] > 0
        assert_greedy_consistent(params, cfg, PROMPTS[0], out[r0],
                                 tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_spec_sampled_deterministic_and_low_temp_greedy(tiny_model):
    """Sampled spec blocks: (a) the coin stream makes runs reproducible
    — same engine, RNG re-seeded, same stream bit-for-bit (same
    executables, no compile lottery); (b) at near-zero temperature the
    sampled path concentrates on the argmax, so the stream must be
    greedy-consistent (the sampled block math degrades gracefully to
    the greedy one)."""
    from llama_cu_awq_tpu.sampling import XorshiftRNG
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        runs = []
        for _ in range(2):
            be.reset()
            be.rng = XorshiftRNG(1234)
            rid = be.submit(PROMPTS[2], max_new=10, temperature=0.7,
                            topp=0.9)
            runs.append(be.run()[rid])
        assert runs[0] == runs[1]
        assert be.spec_stats["blocks"] > 0  # stats reset per run

        be.reset()
        rid = be.submit(PROMPTS[2], max_new=10, temperature=1e-4)
        out = be.run()[rid]
        assert len(out) == 10
        assert_greedy_consistent(params, cfg, PROMPTS[2], out, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_spec_sampled_acceptance_on_looping_stream(tiny_model):
    """Low-temperature sampling on the looping tiny model: proposals
    fire and get accepted through the SAMPLED verify path (acceptance
    requires the sampled token to equal the proposal — at low
    temperature the distribution is peaked, so loops still speculate
    profitably)."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        be.spec_min_accept = 0.0   # throttle off: probe acceptance only
        rid = be.submit(PROMPTS[0], max_new=40, temperature=0.01)
        out = be.run()
        assert len(out[rid]) == 40
        assert be.spec_stats["blocks"] > 0
        assert be.spec_stats["proposed"] > 0
        assert be.spec_stats["accepted"] > 0

    retry_compile_lottery(scenario, attempts=3)


@pytest.mark.slow
def test_spec_capacity_boundary(tiny_model):
    """Slots whose remaining cache rows are < T must not take a spec
    block (OOB scatter); the fallback chunk caps k and the request
    retires exactly at capacity."""
    from tests.test_batch_engine import retry_compile_lottery

    params, cfg = tiny_model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4, max_seq=16)
        rid = be.submit(PROMPTS[0], max_new=40)  # more than fits
        out = be.run()
        # 4 prompt tokens -> at most 16 - 4 generated; the scheduler
        # retires at pos >= max_seq; stream must still be greedy
        assert 0 < len(out[rid]) <= 16
        assert_greedy_consistent(params, cfg, PROMPTS[0], out[rid],
                                 max_seq=32, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


def test_spec_unknown_mode_rejected(tiny_model):
    params, cfg = tiny_model
    with pytest.raises(ValueError, match="unknown spec mode"):
        make(params, cfg, spec="lookahead")


@pytest.mark.slow
def test_spec_throttles_on_low_acceptance():
    """Non-repetitive streams (32000-vocab random model: proposals
    fire but miss) must trip the adaptive throttle — spec rounds fall
    back to scan chunks instead of paying a weight pass per token —
    while the emitted stream stays greedy."""
    from tests.test_batch_engine import (
        assert_greedy_consistent,
        retry_compile_lottery,
    )

    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=32000, seq_len=128)
    params = synthetic_params(cfg, seed=4, tpu_layout=False,
                              param_dtype=jnp.float32)

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        rid = be.submit([BOS_TOKEN, 9038, 2501, 263, 931], max_new=40)
        out = be.run()
        assert len(out[rid]) == 40
        # blocks ran, acceptance was poor, throttle engaged
        assert be.spec_stats["blocks"] >= 2
        assert be.spec_stats["throttled_rounds"] > 0
        assert_greedy_consistent(params, cfg,
                                 [BOS_TOKEN, 9038, 2501, 263, 931],
                                 out[rid], tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)
