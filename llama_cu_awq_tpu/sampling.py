"""Sampling: greedy argmax, temperature + top-p (nucleus).

Behavioral re-implementation of the reference sampler (sampler.h:43-82 +
gpu_kernels.h:448-584), with the same semantics:

- one xorshift64* coin is consumed per *step* (including teacher-forced
  prompt steps — the reference draws the coin before branching,
  sampler.h:45), so seeded runs shift the RNG stream identically;
- temperature == 0 or teacher-forced steps -> argmax;
- topp outside (0, 1): CDF inversion over the *unsorted* softmax
  distribution with threshold = coin (sampler.h:55-58);
- topp in (0, 1): probabilities sorted descending (stable, like cub radix
  sort), threshold = coin * topp against the inclusive prefix sum, token =
  first crossing (sampler.h:60-80, gpu_kernels.h:555-584).

The compute is jittable JAX (runs on device inside the decode step); the
xorshift RNG runs on the host exactly like the reference's
(sampler.h:31-40) and its coins are passed in as data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_M64 = (1 << 64) - 1


class XorshiftRNG:
    """xorshift64* generator, bit-exact with sampler.h:31-40."""

    def __init__(self, seed: int):
        self.state = seed & _M64

    def random_u32(self) -> int:
        s = self.state
        s ^= (s >> 12)
        s ^= (s << 25) & _M64
        s ^= (s >> 27)
        self.state = s
        return ((s * 0x2545F4914F6CDD1D) & _M64) >> 32

    def random_f32(self) -> float:
        return (self.random_u32() >> 8) / 16777216.0


def sample_token(logits: jax.Array, coin: jax.Array, temperature: float,
                 topp: float) -> jax.Array:
    """logits: (..., vocab) f32; coin: (...,) in [0,1). Returns int32 token.

    Static temperature/topp select the algorithm (matching the reference's
    host-side branching); the data path is fully jittable.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # temperature scale + softmax staged through the activation precision
    # the reference uses (softmax_logits_kernel writes half probs,
    # gpu_kernels.h:499-550)
    probs = jax.nn.softmax(logits / temperature, axis=-1)

    if topp <= 0.0 or topp >= 1.0:
        # CDF inversion over vocab order (no sort), threshold = coin
        cdf = jnp.cumsum(probs, axis=-1)
        idx = jnp.sum(cdf < coin[..., None], axis=-1)
        # default to the last index if rounding keeps the sum below coin
        # (sample_top_p_kernel's min_index = n-1 default)
        return jnp.minimum(idx, probs.shape[-1] - 1).astype(jnp.int32)

    # top-p: stable descending sort (cub DeviceRadixSort parity), prefix
    # sum, first index crossing coin * topp
    order = jnp.argsort(-probs, axis=-1, stable=True)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cdf = jnp.cumsum(sorted_probs, axis=-1)
    threshold = coin[..., None] * topp
    idx = jnp.sum(cdf < threshold, axis=-1, keepdims=True)
    idx = jnp.minimum(idx, probs.shape[-1] - 1)
    return jnp.take_along_axis(order, idx, axis=-1)[..., 0].astype(jnp.int32)


def greedy(logits: jax.Array) -> jax.Array:
    """Argmax sampling (argmax_kernel, gpu_kernels.h:448-493)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token_vec(logits: jax.Array, coin: jax.Array,
                     temperature: jax.Array, topp: jax.Array) -> jax.Array:
    """Per-row sampling parameters (continuous batching serves requests
    with different temperature/top_p in one batched step — a capability
    extension over the reference's process-global sampler, sampler.h).

    logits: (B, V) f32; coin/temperature/topp: (B,). Rows with
    temperature <= 0 are greedy; rows with topp outside (0, 1) use the
    unsorted-CDF inversion; otherwise sorted nucleus sampling — each
    branch with the exact semantics of `sample_token`.
    """
    V = logits.shape[-1]
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    probs = jax.nn.softmax(logits / t, axis=-1)

    cdf = jnp.cumsum(probs, axis=-1)
    plain = jnp.minimum(jnp.sum(cdf < coin[:, None], axis=-1),
                        V - 1).astype(jnp.int32)

    order = jnp.argsort(-probs, axis=-1, stable=True)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cdf_s = jnp.cumsum(sorted_probs, axis=-1)
    thr = (coin * topp)[:, None]
    idx = jnp.minimum(jnp.sum(cdf_s < thr, axis=-1, keepdims=True), V - 1)
    nucleus = jnp.take_along_axis(order, idx, axis=-1)[:, 0].astype(
        jnp.int32)

    sampled = jnp.where((topp > 0.0) & (topp < 1.0), nucleus, plain)
    return jnp.where(temperature <= 0.0, greedy_tok, sampled)
