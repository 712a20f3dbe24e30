import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.sampling import XorshiftRNG, greedy, sample_token


def test_xorshift_matches_reference_algorithm():
    """Bit-exact xorshift64* (sampler.h:31-40), checked against a direct
    reimplementation of the C arithmetic."""

    def c_random_u32(state):
        m = (1 << 64) - 1
        state ^= state >> 12
        state = (state ^ (state << 25)) & m
        state ^= state >> 27
        return state, ((state * 0x2545F4914F6CDD1D) & m) >> 32

    rng = XorshiftRNG(12345)
    s = 12345
    for _ in range(100):
        s, expect = c_random_u32(s)
        assert rng.random_u32() == expect


def test_random_f32_range():
    rng = XorshiftRNG(7)
    vals = [rng.random_f32() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.3 < np.mean(vals) < 0.7


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.1, 2.0, -1.0, 1.9]])
    assert int(greedy(logits)[0]) == 1
    assert int(sample_token(logits, jnp.asarray([0.5]), 0.0, 0.6)[0]) == 1


def test_temperature_only_cdf_semantics():
    """topp >= 1 -> CDF inversion over the unsorted distribution with
    threshold = coin (sampler.h:55-58)."""
    logits = jnp.log(jnp.asarray([[0.2, 0.5, 0.3]]))
    for coin, expect in [(0.1, 0), (0.19, 0), (0.21, 1), (0.69, 1),
                         (0.71, 2), (0.99, 2)]:
        got = int(sample_token(logits, jnp.asarray([coin]), 1.0, 1.0)[0])
        assert got == expect, (coin, got, expect)


def test_topp_threshold_scaling():
    """topp in (0,1): sort desc, threshold = coin * topp
    (sampler.h:70, gpu_kernels.h:555-584)."""
    probs = np.asarray([[0.05, 0.6, 0.3, 0.05]])
    logits = jnp.log(jnp.asarray(probs))
    # sorted desc: [0.6 (id1), 0.3 (id2), 0.05, 0.05]; cumsum .6 .9 .95 1.0
    # threshold = coin * 0.9
    for coin, expect in [(0.1, 1), (0.6, 1), (0.7, 2), (0.99, 2)]:
        got = int(sample_token(logits, jnp.asarray([coin]), 1.0, 0.9)[0])
        assert got == expect, (coin, got, expect)


def test_topp_excludes_tail():
    """With a tight topp, tail tokens are unreachable even at coin ~ 1."""
    probs = np.asarray([[0.01, 0.9, 0.05, 0.04]])
    logits = jnp.log(jnp.asarray(probs))
    for coin in np.linspace(0.0, 0.999, 50):
        got = int(sample_token(logits, jnp.asarray([coin]), 1.0, 0.5)[0])
        assert got == 1


def test_temperature_sharpens():
    rngs = XorshiftRNG(42)
    logits = jnp.asarray([[1.0, 1.2, 0.8, 1.1]])
    # low temperature concentrates samples on argmax
    hits = 0
    for _ in range(200):
        coin = jnp.asarray([rngs.random_f32()])
        hits += int(sample_token(logits, coin, 0.01, 1.0)[0]) == 1
    assert hits >= 199


def test_batched_sampling_shape():
    logits = jnp.zeros((4, 16))
    out = sample_token(logits, jnp.full((4,), 0.5), 1.0, 0.6)
    assert out.shape == (4,)
