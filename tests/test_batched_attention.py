"""Batched (serving-shape) decode-attention Pallas kernel vs the einsum
oracle — bf16/f32 caches and the int8-native codes+scales path."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.models.llama import _attention, quantize_kv
from llama_cu_awq_tpu.ops.pallas.batched_attention import (
    batched_decode_attention,
    supports,
)


def make_inputs(rng, B, A, H, n_kv, D, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, A, n_kv, D)) * 0.3, dtype)
    v = jnp.asarray(rng.standard_normal((B, A, n_kv, D)) * 0.3, dtype)
    return q, k, v


@pytest.mark.parametrize("B,A,H,n_kv,D,pos", [
    (2, 128, 4, 4, 128, 0),       # MHA, first token
    (3, 256, 4, 2, 128, 200),     # GQA, two blocks
    (1, 512, 8, 8, 128, 511),     # full window
    (4, 256, 4, 2, 128, None),    # per-row positions
])
def test_kernel_matches_einsum(rng, B, A, H, n_kv, D, pos):
    q, k, v = make_inputs(rng, B, A, H, n_kv, D)
    positions = (jnp.asarray([pos] * B, jnp.int32) if pos is not None
                 else jnp.asarray(rng.integers(0, A, B), jnp.int32))
    assert supports(q[:, 0], k)

    out = np.asarray(batched_decode_attention(q[:, 0], k, v, positions,
                                              interpret=True))
    expect = np.asarray(
        _attention(q, k, v, positions, jnp.float32, impl="dequant"))
    np.testing.assert_allclose(out.reshape(B, 1, H * D), expect,
                               rtol=3e-2, atol=3e-2)


def test_int8_native_matches_dequant_einsum(rng):
    """codes+scales into the kernel == dequantize-then-einsum."""
    B, A, H, n_kv, D = 3, 256, 4, 2, 128
    q, k, v = make_inputs(rng, B, A, H, n_kv, D)
    positions = jnp.asarray([200, 31, 255], jnp.int32)
    kq, ks = quantize_kv(k)   # (B, A, n_kv, D) int8, (B, A, n_kv) f32
    vq, vs = quantize_kv(v)

    out = np.asarray(batched_decode_attention(
        q[:, 0], kq, vq, positions, ks, vs, interpret=True))

    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    expect = np.asarray(
        _attention(q, k_deq, v_deq, positions, jnp.float32,
                   impl="dequant"))
    np.testing.assert_allclose(out.reshape(B, 1, H * D), expect,
                               rtol=3e-2, atol=3e-2)


def test_scheduling_variants_match(rng):
    """early_exit on/off and a static attn_len grid bound are pure
    scheduling choices — identical numerics."""
    B, A, H, n_kv, D = 3, 512, 4, 2, 128
    q, k, v = make_inputs(rng, B, A, H, n_kv, D)
    positions = jnp.asarray([57, 300, 127], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)

    base = np.asarray(batched_decode_attention(
        q[:, 0], kq, vq, positions, ks, vs, interpret=True))
    static = np.asarray(batched_decode_attention(
        q[:, 0], kq, vq, positions, ks, vs, interpret=True,
        early_exit=False))
    np.testing.assert_array_equal(base, static)
    # attn_len bounds the grid: any bound >= max(pos)+1 is equivalent
    for attn_len in (384, 512):
        bounded = np.asarray(batched_decode_attention(
            q[:, 0], kq, vq, positions, ks, vs, interpret=True,
            attn_len=attn_len))
        np.testing.assert_array_equal(base, bounded)


def test_mask_respects_pos(rng):
    B, A, H, n_kv, D = 2, 256, 4, 2, 128
    q, k, v = make_inputs(rng, B, A, H, n_kv, D)
    positions = jnp.asarray([57, 123], jnp.int32)
    out1 = np.asarray(batched_decode_attention(q[:, 0], k, v, positions,
                                               interpret=True))
    k2 = k.at[0, 58:].set(1e4).at[1, 124:].set(1e4)
    v2 = v.at[0, 58:].set(-1e4).at[1, 124:].set(-1e4)
    out2 = np.asarray(batched_decode_attention(q[:, 0], k2, v2, positions,
                                               interpret=True))
    np.testing.assert_array_equal(out1, out2)


def test_forward_with_batched_impl(tiny_mha_config):
    """Full decode step with attn_impl='batched' (interpret) vs dequant:
    tiny_mha_config has head_dim 16 -> kernel unsupported, falls back;
    use a 128-head-dim config instead."""
    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.models import (
        forward,
        init_kv_cache,
        params_from_checkpoint,
    )

    cfg = ModelConfig(dim=512, hidden_dim=1024, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=512, seq_len=256)
    params = params_from_checkpoint(random_checkpoint(cfg, seed=3),
                                    param_dtype=jnp.float32)
    tok = jnp.asarray([[5], [9], [101]])
    pos = jnp.asarray([3, 0, 7], jnp.int32)

    for quant in (False, True):
        c1 = init_kv_cache(cfg, 3, 128, dtype=jnp.float32, quantized=quant)
        l1, _ = forward(params, cfg, tok, pos, c1, attn_len=128,
                        act_dtype=jnp.float32, matmul_impl="dequant")
        c2 = init_kv_cache(cfg, 3, 128, dtype=jnp.float32, quantized=quant)
        l2, _ = forward(params, cfg, tok, pos, c2, attn_len=128,
                        act_dtype=jnp.float32, matmul_impl="dequant",
                        attn_impl="batched")
        a, b = np.asarray(l1), np.asarray(l2)
        assert np.abs(a - b).max() < 3e-2 * np.abs(a).max() + 3e-2, quant
