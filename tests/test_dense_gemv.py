"""Dense bf16 GEMV Pallas kernel vs jnp.dot oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.ops.pallas.dense_gemv import (
    _pick_tile,
    dense_gemv,
    supports,
)


@pytest.mark.parametrize("m,v,d", [
    (1, 512, 128),      # single tile
    (1, 32000, 256),    # llama vocab: tile must divide 32000
    (4, 1024, 384),
    (128, 2048, 256),   # prefill logits_all block
])
def test_gemv_matches_oracle(rng, m, v, d):
    w = jnp.asarray(rng.standard_normal((v, d)) * 0.05, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    out = np.asarray(dense_gemv(x, w, interpret=True))
    expect = np.asarray(
        jnp.dot(x, w.T, preferred_element_type=jnp.float32))
    assert out.shape == (m, v)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_gemv_3d_and_tiles(rng):
    w = jnp.asarray(rng.standard_normal((512, 128)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, 3, 128)), jnp.bfloat16)
    out = dense_gemv(x, w, interpret=True)
    assert out.shape == (2, 3, 512)

    # 32000 = 2000 * 16: a 16-multiple tile must exist for llama vocab
    assert _pick_tile(32000, 4096, 2) is not None
    assert 32000 % _pick_tile(32000, 4096, 2) == 0
    assert _pick_tile(100, 128, 2) is None  # no 16-multiple divisor


def test_supports_gate():
    w16 = jnp.zeros((512, 128), jnp.bfloat16)
    x = jnp.zeros((1, 128), jnp.bfloat16)
    assert supports(x, w16)
    assert not supports(x, jnp.zeros((512, 128), jnp.float16))  # dtype
    assert not supports(jnp.zeros((512, 128), jnp.bfloat16), w16)  # m cap
    assert not supports(jnp.zeros((1, 100), jnp.bfloat16),
                        jnp.zeros((512, 100), jnp.bfloat16))  # lane align


def test_gemv_manual_dma_single_tile(rng, monkeypatch):
    """Manual-DMA weight streaming for the classifier GEMV
    (LLAMA_GEMV_MANUAL_DMA): interpret-mode parity at a single-grid-step
    shape (multi-step grids need cross-step DMA semaphore state neither
    CPU interpreter carries — chip-gated instead, bitwise vs the
    auto-pipeline at the 7B lm_head shape, PERFORMANCE.md round 3)."""
    import llama_cu_awq_tpu.ops.linear as linear

    monkeypatch.setenv("LLAMA_GEMV_MANUAL_DMA", "2")
    monkeypatch.setattr(linear, "_on_tpu", lambda: True)  # env is TPU-gated
    w = jnp.asarray(rng.standard_normal((1280, 128)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 128)), jnp.bfloat16)
    out = np.asarray(dense_gemv(x, w, interpret=True))
    expect = np.asarray(x, np.float32) @ np.asarray(w, np.float32).T
    np.testing.assert_allclose(out, expect, rtol=2e-2, atol=2e-2)


def test_gemv_manual_dma_inherits_capped(monkeypatch):
    """LLAMA_INT4_MANUAL_DMA flips the gemv ring too, capped at depth 2
    (gemv tiles are ~5 MB; a deep ring would blow the scoped pool)."""
    import llama_cu_awq_tpu.ops.linear as linear
    from llama_cu_awq_tpu.ops.pallas.dense_gemv import _gemv_mdma_n_buf

    monkeypatch.setattr(linear, "_on_tpu", lambda: True)
    monkeypatch.delenv("LLAMA_GEMV_MANUAL_DMA", raising=False)
    monkeypatch.setenv("LLAMA_INT4_MANUAL_DMA", "6")
    assert _gemv_mdma_n_buf() == 2
    monkeypatch.setenv("LLAMA_GEMV_MANUAL_DMA", "0")
    assert _gemv_mdma_n_buf() == 0
    monkeypatch.setenv("LLAMA_GEMV_MANUAL_DMA", "3")
    assert _gemv_mdma_n_buf() == 3
    monkeypatch.delenv("LLAMA_INT4_MANUAL_DMA", raising=False)
    monkeypatch.delenv("LLAMA_GEMV_MANUAL_DMA", raising=False)
    assert _gemv_mdma_n_buf() == 0
