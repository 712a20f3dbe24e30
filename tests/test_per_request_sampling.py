"""Per-request sampling parameters: sample_token_vec semantics vs the
scalar sampler, and mixed-temperature continuous batching."""

import pytest
import jax.numpy as jnp
import numpy as np

from llama_cu_awq_tpu.engine.batch import BatchEngine
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
from llama_cu_awq_tpu.models import params_from_checkpoint
from llama_cu_awq_tpu.sampling import sample_token, sample_token_vec
from llama_cu_awq_tpu.tokenizer import BOS_TOKEN


def test_vec_matches_scalar_rows(rng):
    """Each row of sample_token_vec equals sample_token with that row's
    (temperature, topp), for all three algorithm branches."""
    B, V = 6, 64
    logits = jnp.asarray(rng.standard_normal((B, V)) * 2, jnp.float32)
    coins = jnp.asarray(rng.uniform(0, 1, B), jnp.float32)
    temps = jnp.asarray([0.0, 0.7, 1.0, 0.5, 0.9, 0.0], jnp.float32)
    topps = jnp.asarray([0.6, 0.0, 1.5, 0.6, 0.9, 0.0], jnp.float32)

    got = np.asarray(sample_token_vec(logits, coins, temps, topps))
    for b in range(B):
        want = sample_token(logits[b:b + 1], coins[b:b + 1],
                            float(temps[b]), float(topps[b]))
        assert got[b] == int(np.asarray(want)[0]), (b, got[b], want)


@pytest.mark.slow
def test_mixed_temperature_batch(tiny_config):
    """Greedy and sampled requests share one batched step: the greedy
    request's stream stays greedy-consistent while the sampled neighbor
    draws from its own distribution."""
    from test_batch_engine import (
        assert_greedy_consistent,
        retry_compile_lottery,
    )

    cfg = tiny_config
    params = params_from_checkpoint(random_checkpoint(cfg, seed=4),
                                    param_dtype=jnp.float32)

    def scenario():
        be = BatchEngine(params, cfg, n_slots=2, max_seq=64,
                         act_dtype=jnp.float32, matmul_impl="dequant",
                         temperature=0.0, chunk_size=4, seed=111,
                         prefer_native_scheduler=False)
        g = be.submit([BOS_TOKEN, 5, 9], max_new=6)  # engine default greedy
        s = be.submit([BOS_TOKEN, 7], max_new=6, temperature=0.9,
                      topp=0.9)
        out = be.run()
        assert_greedy_consistent(params, cfg, [BOS_TOKEN, 5, 9], out[g],
                                 max_seq=64)
        assert len(out[s]) >= 1
        assert all(0 <= t < cfg.vocab_size for t in out[s])

    retry_compile_lottery(scenario)


def test_greedy_fast_path_unchanged(tiny_config):
    """All-greedy batches compile the fast path (sampled=False) and
    produce the same stream as before the per-request extension."""
    cfg = tiny_config
    params = params_from_checkpoint(random_checkpoint(cfg, seed=4),
                                    param_dtype=jnp.float32)
    be = BatchEngine(params, cfg, n_slots=2, max_seq=64,
                     act_dtype=jnp.float32, matmul_impl="dequant",
                     temperature=0.0, chunk_size=4,
                     prefer_native_scheduler=False)
    r = be.submit([BOS_TOKEN, 5, 9], max_new=5)
    out = be.run()
    assert len(out[r]) == 5
