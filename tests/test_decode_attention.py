"""Blockwise decode-attention Pallas kernel vs the einsum oracle
(interpret mode on CPU; compiled on real TPU by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.models.llama import _attention
from llama_cu_awq_tpu.ops.pallas.decode_attention import (
    decode_attention,
    supports,
)


def make_inputs(rng, B, A, H, n_kv, D, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, A, n_kv, D)) * 0.3, dtype)
    v = jnp.asarray(rng.standard_normal((B, A, n_kv, D)) * 0.3, dtype)
    return q, k, v


@pytest.mark.parametrize("B,A,H,n_kv,D,pos", [
    (1, 128, 4, 4, 128, 0),       # single block, first token (MHA)
    (1, 256, 4, 2, 128, 200),     # GQA, two blocks
    (1, 512, 8, 8, 128, 511),     # full window
    (4, 256, 4, 2, 128, None),    # batch with per-row positions
    (1, 128, 4, 4, 256, 100),     # wider head_dim
])
def test_kernel_matches_einsum(rng, B, A, H, n_kv, D, pos):
    q, k, v = make_inputs(rng, B, A, H, n_kv, D)
    positions = (jnp.asarray([pos] * B, jnp.int32) if pos is not None
                 else jnp.asarray(rng.integers(0, A, B), jnp.int32))
    assert supports(q[:, 0], k)

    out = np.asarray(decode_attention(q[:, 0], k, v, positions,
                                      interpret=True))
    # oracle: the einsum path in full f32 (dequant/act f32 staging)
    expect = np.asarray(
        _attention(q, k, v, positions, jnp.float32, impl="dequant"))
    np.testing.assert_allclose(out.reshape(B, 1, H * D), expect,
                               rtol=2e-5, atol=2e-5)


def test_bf16_cache(rng):
    """bf16 cache (the production dtype): MXU-staged operands."""
    B, A, H, n_kv, D = 1, 256, 4, 4, 128
    q, k, v = make_inputs(rng, B, A, H, n_kv, D, jnp.bfloat16)
    positions = jnp.asarray([255], jnp.int32)
    out = np.asarray(decode_attention(q[:, 0], k, v, positions,
                                      interpret=True))
    expect = np.asarray(_attention(
        q, k, v, positions, jnp.bfloat16, impl="dequant"))
    np.testing.assert_allclose(out.reshape(B, 1, H * D), expect,
                               rtol=2e-2, atol=2e-2)


def test_mask_respects_pos(rng):
    """Rows beyond pos must not contribute: poisoning them changes
    nothing."""
    B, A, H, n_kv, D = 1, 256, 4, 2, 128
    q, k, v = make_inputs(rng, B, A, H, n_kv, D)
    positions = jnp.asarray([57], jnp.int32)
    out1 = np.asarray(decode_attention(q[:, 0], k, v, positions,
                                       interpret=True))
    k2 = k.at[:, 58:].set(1e4)
    v2 = v.at[:, 58:].set(-1e4)
    out2 = np.asarray(decode_attention(q[:, 0], k2, v2, positions,
                                       interpret=True))
    np.testing.assert_array_equal(out1, out2)


def test_forward_decode_uses_kernel_consistently(tiny_config):
    """Full decode step: pallas attention path (interpret) vs dequant
    einsum path on the same cache state."""
    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.models import (
        forward, init_kv_cache, params_from_checkpoint)

    cfg = tiny_config  # head_dim 16 -> kernel unsupported, falls back
    ckpt = random_checkpoint(cfg, seed=5)
    params = params_from_checkpoint(ckpt, param_dtype=jnp.float32)
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    tok = jnp.asarray([[7]])
    pos = jnp.zeros(1, jnp.int32)
    l1, _ = forward(params, cfg, tok, pos, cache, attn_len=32,
                    act_dtype=jnp.float32, matmul_impl="dequant")
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    l2, _ = forward(params, cfg, tok, pos, cache, attn_len=32,
                    act_dtype=jnp.float32, matmul_impl=None)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5,
                               atol=1e-5)
