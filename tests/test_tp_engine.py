"""Tensor-parallel ENGINES (InferenceEngine / BatchEngine with a mesh)
must reproduce the single-device engines' greedy streams on the virtual
8-device CPU mesh — the integrated form of BASELINE.json's "13B
tensor-sharded, continuous batching" config, tested the SURVEY.md §4 way
(forced-host-device mesh instead of a pod slice)."""

import jax
import jax.numpy as jnp
import pytest
from test_batch_engine import assert_greedy_consistent, retry_compile_lottery

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.engine import InferenceEngine
from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import params_from_checkpoint
from llama_cu_awq_tpu.parallel import make_mesh, tp_params_from_checkpoint
from llama_cu_awq_tpu.parallel.tp import place_params
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

TP = 4


pytestmark = pytest.mark.slow  # integration tier (see README testing section)

@pytest.fixture(scope="module")
def setup():
    # head_dim 128 so per-shard kv_dim stays quant-group aligned at tp=4
    cfg = ModelConfig(dim=512, hidden_dim=1024, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=512, seq_len=96)
    ckpt = random_checkpoint(cfg, seed=123)
    single = params_from_checkpoint(ckpt, param_dtype=jnp.float32,
                                    tpu_layout=True)
    mesh = make_mesh(tp=TP, dp=1, devices=jax.devices()[:TP])
    tp_params = place_params(
        tp_params_from_checkpoint(ckpt, TP, param_dtype=jnp.float32),
        cfg, mesh)
    return cfg, single, mesh, tp_params


def test_tp_inference_engine_matches_single(setup):
    cfg, single, mesh, tp_params = setup
    prompt = [BOS_TOKEN, 7, 130, 400, 23]
    n_new = 10

    def scenario():
        eng = InferenceEngine(tp_params, cfg, act_dtype=jnp.float32,
                              matmul_impl="dequant", temperature=0.0,
                              max_seq=96, chunk_size=4, mesh=mesh)
        got, _, _ = eng.generate_benchmark(prompt, len(prompt) + n_new)
        assert_greedy_consistent(single, cfg, prompt, got[:n_new])

    retry_compile_lottery(scenario)


def test_tp_inference_engine_block_prefill(setup):
    """Long prompt exercises the blockwise logits_all prefill under
    shard_map (vocab-sharded lm_head all_gather at T > 1)."""
    cfg, single, mesh, tp_params = setup
    prompt = [BOS_TOKEN] + [(31 * i) % 500 for i in range(70)]
    n_new = 4

    def scenario():
        eng = InferenceEngine(tp_params, cfg, act_dtype=jnp.float32,
                              matmul_impl="dequant", temperature=0.0,
                              max_seq=96, chunk_size=4, mesh=mesh)
        got, _, _ = eng.generate_benchmark(prompt, len(prompt) + n_new)
        assert_greedy_consistent(single, cfg, prompt, got[:n_new])

    retry_compile_lottery(scenario)


def test_tp_batch_engine_matches_single(setup):
    cfg, single, mesh, tp_params = setup
    prompts = [
        [BOS_TOKEN, 5, 9, 100],
        [BOS_TOKEN, 442, 17],
        [BOS_TOKEN, 7, 7, 7, 7, 7],
    ]
    n_new = 8

    def scenario():
        be = BatchEngine(tp_params, cfg, n_slots=2, max_seq=96,
                         act_dtype=jnp.float32, matmul_impl="dequant",
                         temperature=0.0, chunk_size=4, mesh=mesh)
        rids = [be.submit(p, max_new=n_new) for p in prompts]
        out = be.run()
        assert be.scheduler.num_active == 0
        assert be.scheduler.num_queued == 0
        for rid, p in zip(rids, prompts):
            assert_greedy_consistent(single, cfg, p, out[rid])

    retry_compile_lottery(scenario)


def test_tp_batch_engine_long_prompt_prefill(setup):
    """A > FORCED_PROMPT_MAX prompt takes the per-slot block-prefill path
    (dynamic slot slice of the head-sharded cache outside shard_map)."""
    cfg, single, mesh, tp_params = setup
    prompt = [BOS_TOKEN] + [(13 * i) % 500 for i in range(60)]
    n_new = 5

    def scenario():
        be = BatchEngine(tp_params, cfg, n_slots=2, max_seq=96,
                         act_dtype=jnp.float32, matmul_impl="dequant",
                         temperature=0.0, chunk_size=4, mesh=mesh)
        rid = be.submit(prompt, max_new=n_new)
        rid2 = be.submit([BOS_TOKEN, 42], max_new=n_new)
        out = be.run()
        assert_greedy_consistent(single, cfg, prompt, out[rid])
        assert_greedy_consistent(single, cfg, [BOS_TOKEN, 42], out[rid2])

    retry_compile_lottery(scenario)


def test_tp_batch_engine_kv_quant_runs(setup):
    """int8 KV cache + TP: codes and per-vector scales both sharded over
    the kv-head axis."""
    cfg, single, mesh, tp_params = setup
    be = BatchEngine(tp_params, cfg, n_slots=2, max_seq=96,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4, mesh=mesh,
                     kv_quant=True)
    r1 = be.submit([BOS_TOKEN, 5, 9], max_new=4)
    r2 = be.submit([BOS_TOKEN, 442], max_new=4)
    out = be.run()
    assert len(out[r1]) >= 1 and len(out[r2]) >= 1


def test_tp_spec_decode_matches_single(setup):
    """Speculative decoding under tensor parallelism: the verify step
    runs through the shard_map forward (logits_all at T = k+1 with the
    vocab-sharded lm_head), and the emitted stream must still replay
    as the single-device greedy stream."""
    cfg, single, mesh, tp_params = setup
    prompt = [BOS_TOKEN, 7, 130, 400, 23]
    n_new = 12

    def scenario():
        eng = InferenceEngine(tp_params, cfg, act_dtype=jnp.float32,
                              matmul_impl="dequant", temperature=0.0,
                              max_seq=96, chunk_size=4, mesh=mesh,
                              spec="ngram", spec_k=4)
        got, _, _ = eng.generate_benchmark(prompt, len(prompt) + n_new)
        assert len(got) == n_new + 1
        assert_greedy_consistent(single, cfg, prompt, got[:n_new])

    retry_compile_lottery(scenario)
