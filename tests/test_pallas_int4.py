"""Pallas int4 matmul kernel vs the dequant oracle (interpret mode on CPU;
the same kernel compiles on real TPU — exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.ops.pallas.int4_matmul import int4_matmul
from llama_cu_awq_tpu.quant import packing
from llama_cu_awq_tpu.quant.qtensor import QTensor, to_tpu_layout


def make_qt(rng, n, d):
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.1
    qw, zeros, scales = packing.quantize_np(w)
    return QTensor.quantize(w), QTensor(
        jnp.asarray(qw), jnp.asarray(zeros), jnp.asarray(scales), n, d)


def test_planar_roundtrip(rng):
    n, d = 1536, 256
    q = rng.integers(0, 16, size=(n, d), dtype=np.int32)
    planar = packing.to_planar(packing.pack_nibbles(q), n)
    assert planar.shape == (packing.planar_pad(n) // 8, d)
    back = packing.from_planar(planar, n)
    assert np.array_equal(back, q.astype(np.int8))


def test_planar_nonmultiple_rows(rng):
    n, d = 1100, 128  # pads to 2048: an EVEN number of 512-row chunks
    q = rng.integers(0, 16, size=(n, d), dtype=np.int32)
    planar = packing.to_planar(packing.pack_nibbles(q), n)
    assert planar.shape == (packing.planar_pad(n) // 8, d)
    assert packing.planar_pad(n) == 2048
    assert packing.planar_pad(13824) // 512 % 2 == 0  # 13B hidden_dim
    assert np.array_equal(packing.from_planar(planar, n), q.astype(np.int8))


def test_tpu_layout_dequantize_matches_canonical(rng):
    n, d = 1280, 128
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.05
    qt = QTensor.quantize(w)
    qtt = to_tpu_layout(qt)
    # the TPU layout stores scales in bf16 (packing.build_meta): purely
    # multiplicative rounding <= 2^-8 relative vs the f32 canonical path
    np.testing.assert_allclose(np.asarray(qt.dequantize()),
                               np.asarray(qtt.dequantize()),
                               rtol=2 ** -8, atol=0)


@pytest.mark.parametrize("batch,n,d", [
    (1, 1024, 128),     # single-tile GEMV
    (1, 2048, 256),     # multi n-tile
    (4, 1024, 512),     # batched decode, full TILE_D
    (8, 1280, 128),     # padded rows (1280 -> 2048)
    (16, 1024, 384),    # tile_d = 128 fallback (384 = 3*128)
])
def test_kernel_matches_oracle(rng, batch, n, d):
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.1
    qt = to_tpu_layout(QTensor.quantize(w))
    x = rng.standard_normal((batch, n), dtype=np.float32)
    x_bf16 = jnp.asarray(x, jnp.bfloat16)

    out = np.asarray(int4_matmul(x_bf16, qt, interpret=True))
    expect = np.asarray(x_bf16, np.float32) @ np.asarray(
        qt.dequantize(jnp.float32))
    assert out.shape == (batch, d)
    np.testing.assert_allclose(out, expect, rtol=2e-2, atol=2e-3)


def test_kernel_3d_input(rng):
    n, d = 1024, 128
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.1
    qt = to_tpu_layout(QTensor.quantize(w))
    x = jnp.asarray(rng.standard_normal((2, 3, n), dtype=np.float32),
                    jnp.bfloat16)
    out = int4_matmul(x, qt, interpret=True)
    assert out.shape == (2, 3, d)
    flat = int4_matmul(x.reshape(6, n), qt, interpret=True)
    np.testing.assert_array_equal(np.asarray(out).reshape(6, d),
                                  np.asarray(flat))


def test_forward_with_tpu_layout_matches_canonical(tiny_config):
    """Full model forward: planar params (dequant fallback on CPU) must
    equal canonical params."""
    import jax.numpy as jnp

    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.models import (
        forward, init_kv_cache, params_from_checkpoint)

    cfg = tiny_config
    ckpt = random_checkpoint(cfg, seed=3)
    p1 = params_from_checkpoint(ckpt, param_dtype=jnp.float32)
    p2 = params_from_checkpoint(ckpt, param_dtype=jnp.float32,
                                tpu_layout=True)
    tokens = jnp.asarray([[5, 9, 2, 77]])
    pos = jnp.zeros(1, jnp.int32)
    c1 = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    c2 = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    l1, _ = forward(p1, cfg, tokens, pos, c1, act_dtype=jnp.float32,
                    matmul_impl="dequant", logits_all=True)
    l2, _ = forward(p2, cfg, tokens, pos, c2, act_dtype=jnp.float32,
                    matmul_impl="dequant", logits_all=True)
    # planar weights carry bf16 scales (multiplicative <= 2^-8 per weight)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-2,
                               atol=2e-2)


def test_manual_dma_single_tile_matches_oracle(rng, monkeypatch):
    """Manual-DMA weight streaming (LLAMA_INT4_MANUAL_DMA): parity at a
    single-grid-step shape. Multi-step grids hang under BOTH Pallas
    interpreters on CPU (cross-grid-step DMA semaphore state is not
    carried), so those are gated on real hardware instead: bitwise
    vs the auto-pipeline at 7B shapes on chip (PERFORMANCE.md round 3)
    and tools/chip_parity.py before any promotion."""
    import llama_cu_awq_tpu.ops.linear as linear

    monkeypatch.setenv("LLAMA_INT4_MANUAL_DMA", "2")
    monkeypatch.setattr(linear, "_on_tpu", lambda: True)  # env is TPU-gated
    n, d = 1024, 128  # n_chunks=2, tile_d=128 -> grid (1, 1)
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.1
    qt = to_tpu_layout(QTensor.quantize(w))
    x = jnp.asarray(rng.standard_normal((1, n), dtype=np.float32),
                    jnp.bfloat16)
    out = np.asarray(int4_matmul(x, qt, interpret=True))
    expect = np.asarray(x, np.float32) @ np.asarray(
        qt.dequantize(jnp.float32))
    np.testing.assert_allclose(out, expect, rtol=2e-2, atol=2e-3)


def test_manual_dma_odd_chunks_falls_back(rng, monkeypatch):
    """Odd chunk counts break the bf16 meta slice's 16-row sublane
    granule; the dispatch must silently use the auto-pipeline (this
    shape would otherwise hang interpret mode — a pass here IS the
    fallback proof)."""
    import llama_cu_awq_tpu.ops.linear as linear

    monkeypatch.setenv("LLAMA_INT4_MANUAL_DMA", "2")
    monkeypatch.setattr(linear, "_on_tpu", lambda: True)
    n, d = 512, 256  # n_chunks=1 -> chunks=1 (odd)
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.1
    qt = to_tpu_layout(QTensor.quantize(w))
    x = jnp.asarray(rng.standard_normal((2, n), dtype=np.float32),
                    jnp.bfloat16)
    out = np.asarray(int4_matmul(x, qt, interpret=True))
    expect = np.asarray(x, np.float32) @ np.asarray(
        qt.dequantize(jnp.float32))
    np.testing.assert_allclose(out, expect, rtol=2e-2, atol=2e-3)


def test_manual_dma_env_is_tpu_gated(monkeypatch):
    """A globally-exported LLAMA_INT4_MANUAL_DMA must NOT reach CPU
    interpret runs (multi-step DMA-ring grids hang both interpreters)."""
    import llama_cu_awq_tpu.ops.linear as linear
    from llama_cu_awq_tpu.ops.pallas.int4_matmul import _mdma_n_buf

    monkeypatch.setenv("LLAMA_INT4_MANUAL_DMA", "4")
    monkeypatch.setattr(linear, "_on_tpu", lambda: False)
    assert _mdma_n_buf() == 0
    monkeypatch.setattr(linear, "_on_tpu", lambda: True)
    assert _mdma_n_buf() == 4
