"""Blockwise causal prefill-attention Pallas kernel vs the einsum
oracle — bf16/f32 caches, int8 codes+scales, causal masking, GQA rows,
and the forward()-level T>1 hook (VERDICT r3 item 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.models.llama import _attention, quantize_kv
from llama_cu_awq_tpu.ops.pallas.prefill_attention import (
    prefill_attention,
    supports,
)


def make_inputs(rng, B, T, A, H, n_kv, D, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, A, n_kv, D)) * 0.3, dtype)
    v = jnp.asarray(rng.standard_normal((B, A, n_kv, D)) * 0.3, dtype)
    return q, k, v


@pytest.mark.parametrize("B,T,A,H,n_kv,D,pos", [
    (1, 16, 256, 4, 4, 128, 0),     # MHA, block at the start
    (1, 32, 256, 4, 4, 128, 100),   # mid-window block (partial past)
    (2, 16, 256, 4, 2, 128, 37),    # GQA kv_mul=2, two slots
    (1, 128, 128, 2, 2, 128, 0),    # block == whole window
    (2, 8, 512, 4, 4, 128, None),   # per-slot positions, deep window
    (1, 16, 256, 16, 16, 128, 60),  # G=8 head groups, n_groups=2
])
def test_kernel_matches_einsum(rng, B, T, A, H, n_kv, D, pos):
    q, k, v = make_inputs(rng, B, T, A, H, n_kv, D)
    positions = (jnp.asarray([pos] * B, jnp.int32) if pos is not None
                 else jnp.asarray(rng.integers(0, A - T, B), jnp.int32))
    assert supports(T, H, D, A, n_kv)

    out = np.asarray(prefill_attention(q, k, v, positions,
                                       interpret=True))
    expect = np.asarray(
        _attention(q, k, v, positions, jnp.float32, impl="dequant"))
    np.testing.assert_allclose(out.reshape(B, T, H * D), expect,
                               rtol=3e-2, atol=3e-2)


def test_int8_native_matches_dequant_einsum(rng):
    """codes+scales into the kernel == dequantize-then-einsum."""
    B, T, A, H, n_kv, D = 2, 16, 256, 4, 2, 128
    q, k, v = make_inputs(rng, B, T, A, H, n_kv, D)
    positions = jnp.asarray([100, 31], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)

    out = np.asarray(prefill_attention(q, kq, vq, positions, ks, vs,
                                       interpret=True))
    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    expect = np.asarray(
        _attention(q, k_deq, v_deq, positions, jnp.float32,
                   impl="dequant"))
    np.testing.assert_allclose(out.reshape(B, T, H * D), expect,
                               rtol=3e-2, atol=3e-2)


def test_causality_exact(rng):
    """Future cache rows (beyond pos + t) must not leak: poisoning them
    leaves the output bit-identical."""
    B, T, A, H, n_kv, D = 2, 16, 256, 4, 4, 128
    q, k, v = make_inputs(rng, B, T, A, H, n_kv, D)
    positions = jnp.asarray([40, 200], jnp.int32)
    out1 = np.asarray(prefill_attention(q, k, v, positions,
                                        interpret=True))
    k2 = k.at[0, 40 + T:].set(1e4).at[1, 200 + T:].set(1e4)
    v2 = v.at[0, 40 + T:].set(-1e4).at[1, 200 + T:].set(-1e4)
    out2 = np.asarray(prefill_attention(q, k2, v2, positions,
                                        interpret=True))
    np.testing.assert_array_equal(out1, out2)


@pytest.mark.slow
def test_attn_len_bound_equivalent(rng):
    B, T, A, H, n_kv, D = 1, 16, 512, 4, 4, 128
    q, k, v = make_inputs(rng, B, T, A, H, n_kv, D)
    positions = jnp.asarray([90], jnp.int32)
    base = np.asarray(prefill_attention(q, k, v, positions,
                                        interpret=True))
    for attn_len in (128, 256, 512):
        bounded = np.asarray(prefill_attention(
            q, k, v, positions, attn_len=attn_len, interpret=True))
        np.testing.assert_array_equal(base, bounded)


def test_forward_prefill_uses_kernel(monkeypatch):
    """forward() T>1 with the kernel vs LLAMA_TPU_PREFILL_ATTN=einsum:
    same logits (within the kernel-vs-staged-softmax tolerance), and
    the caches written by the teacher-forced step agree exactly."""
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
    tok = jnp.asarray([[5, 9, 101, 7, 2, 30, 31, 32]] * 2)
    pos = jnp.asarray([0, 16], jnp.int32)

    for quant in (False, True):
        monkeypatch.setenv("LLAMA_TPU_PREFILL_ATTN", "einsum")
        c1 = init_kv_cache(cfg, 2, 128, dtype=jnp.float32,
                           quantized=quant)
        l1, cc1 = forward(params, cfg, tok, pos, c1, attn_len=128,
                          act_dtype=jnp.float32, matmul_impl="dequant",
                          logits_all=True)
        monkeypatch.setenv("LLAMA_TPU_PREFILL_ATTN", "pallas")
        c2 = init_kv_cache(cfg, 2, 128, dtype=jnp.float32,
                           quantized=quant)
        l2, cc2 = forward(params, cfg, tok, pos, c2, attn_len=128,
                          act_dtype=jnp.float32, matmul_impl="dequant",
                          logits_all=True)
        a, b = np.asarray(l1), np.asarray(l2)
        assert np.abs(a - b).max() < 3e-2 * np.abs(a).max() + 3e-2, quant
        # cache writes are attention-independent only for layer 0; by
        # layer 1 they depend on layer-0 attention, so allclose not
        # equal (and int8 codes can ripple by one step: compare values)
        for i, (x, y) in enumerate(zip(cc1.k, cc2.k)):
            x, y = np.asarray(x, np.float32), np.asarray(y, np.float32)
            if quant:
                x *= np.asarray(cc1.k_scale[i])[..., None]
                y *= np.asarray(cc2.k_scale[i])[..., None]
            np.testing.assert_allclose(x, y, rtol=3e-2, atol=3e-2)
