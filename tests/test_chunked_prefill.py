"""Interleaved (chunked) block prefill at admission: a long prompt
prefills one PREFILL_BLOCK per decode round instead of stalling every
other slot's decode for its whole compute-bound prefill
(engine/batch.py _start_prefill/_advance_prefill). Streams must stay
exactly as correct as the old synchronous path — the parked-tail-row
scheme means a bug here shows up as corrupted prompt rows, which the
greedy-consistency replay catches decisively."""

import jax.numpy as jnp
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.engine.engine import PREFILL_BLOCK
from llama_cu_awq_tpu.models import synthetic_params
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

from tests.test_batch_engine import (
    assert_greedy_consistent,
    retry_compile_lottery,
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(dim=128, hidden_dim=256, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=256, seq_len=512)
    params = synthetic_params(cfg, seed=4, tpu_layout=False,
                              param_dtype=jnp.float32)
    return params, cfg


def make(params, cfg, **kw):
    kw.setdefault("n_slots", 2)
    kw.setdefault("max_seq", 320)
    kw.setdefault("act_dtype", jnp.float32)
    kw.setdefault("matmul_impl", "dequant")
    kw.setdefault("temperature", 0.0)
    kw.setdefault("chunk_size", 4)
    return BatchEngine(params, cfg, **kw)


SHORT = [BOS_TOKEN, 5, 9, 100]
# two PREFILL_BLOCKs + change: several interleaved rounds to finish
LONG = [BOS_TOKEN] + [(7 + 3 * i) % 200 for i in range(PREFILL_BLOCK + 40)]


@pytest.mark.slow
def test_decode_proceeds_during_long_admission(model):
    """A short request decodes tokens in the SAME rounds in which a
    long prompt's prefill job is still in flight — admission no longer
    stalls the batch."""
    params, cfg = model

    def scenario():
        be = make(params, cfg)
        r_short = be.submit(SHORT, max_new=24)
        be.step()                     # admit + start decoding the short one
        r_long = be.submit(LONG, max_new=8)
        saw_interleave = False
        short_tokens = 0
        for _ in range(200):
            results = be.step()
            if be._prefill_jobs:
                short_tokens += sum(
                    len(new) for rid, new, _ in results if rid == r_short)
            if be._prefill_jobs and short_tokens > 0:
                saw_interleave = True
            if not be.pending:
                break
        out = {rid: be._requests[rid].out for rid in (r_short, r_long)}
        assert saw_interleave, (
            "short request emitted nothing while the long prefill was "
            "in flight — admission stalled the batch")
        assert len(out[r_short]) == 24 and len(out[r_long]) == 8
        assert_greedy_consistent(params, cfg, SHORT, out[r_short],
                                 max_seq=320, tol=2e-1)
        assert_greedy_consistent(params, cfg, LONG, out[r_long],
                                 max_seq=320, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


def test_idle_engine_drains_prefill_at_full_speed(model):
    """With nothing else to decode, the prefill job drains completely
    inside one dispatch (no one to starve, so no reason to trickle)."""
    params, cfg = model
    be = make(params, cfg)
    rid = be.submit(LONG, max_new=4)
    be.step()
    assert not be._prefill_jobs  # drained in the first round
    out = be.run()
    assert len(out[rid]) == 4
    assert_greedy_consistent(params, cfg, LONG, out[rid],
                             max_seq=320, tol=2e-1)


def test_cancel_mid_prefill_frees_slot(model):
    """Cancelling a request whose prefill job is in flight discards the
    job and the slot is reusable; the surviving request is unaffected."""
    params, cfg = model

    def scenario():
        be = make(params, cfg)
        r_short = be.submit(SHORT, max_new=16)
        be.step()
        r_long = be.submit(LONG, max_new=8)
        be.step()                         # job started (short still decoding)
        assert be._prefill_jobs
        assert be.cancel(r_long)
        be.step()
        assert not be._prefill_jobs       # discarded, not completed
        r_next = be.submit([BOS_TOKEN, 42, 17], max_new=6)
        while be.pending:
            be.step()
        out_short = be._requests[r_short].out
        out_next = be._requests[r_next].out
        assert len(out_short) == 16 and len(out_next) == 6
        assert_greedy_consistent(params, cfg, SHORT, out_short,
                                 max_seq=320, tol=2e-1)
        assert_greedy_consistent(params, cfg, [BOS_TOKEN, 42, 17],
                                 out_next, max_seq=320, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


def test_boundary_prompt_uses_sync_path(model):
    """A prompt within one chunk of the cache boundary prefills
    synchronously (the parked tail rows would overlap its prompt rows)
    and still generates correctly to capacity."""
    params, cfg = model

    def scenario():
        # max_seq 160, body 157 > 160 - chunk_size(4): boundary guard
        be = make(params, cfg, max_seq=160)
        prompt = [BOS_TOKEN] + [(3 + i) % 200 for i in range(157)]
        rid = be.submit(prompt, max_new=8)
        be._admit()
        assert not be._prefill_jobs  # sync fallback, no job
        out = be.run()
        assert 0 < len(out[rid]) <= 8
        assert_greedy_consistent(params, cfg, prompt, out[rid],
                                 max_seq=320, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)


def test_spec_blocks_with_interleaved_prefill(model):
    """Spec serving: a long admission trickles its prefill between
    spec rounds; both streams stay greedy."""
    params, cfg = model

    def scenario():
        be = make(params, cfg, spec="ngram", spec_k=4)
        r_short = be.submit(SHORT, max_new=16)
        be.step()
        r_long = be.submit(LONG, max_new=8)
        while be.pending:
            be.step()
        out_s = be._requests[r_short].out
        out_l = be._requests[r_long].out
        assert len(out_s) == 16 and len(out_l) == 8
        assert_greedy_consistent(params, cfg, SHORT, out_s,
                                 max_seq=320, tol=2e-1)
        assert_greedy_consistent(params, cfg, LONG, out_l,
                                 max_seq=320, tol=2e-1)

    retry_compile_lottery(scenario, attempts=3)
