"""Fused layer-step matmul (ops/linear.qmatmul_fused + the Pallas
kernel's prologue/epilogue fusions) vs the unfused oracle.

The fused path is the TPU analog of the reference's dedicated kernel
variants (qkv_matvec_kernel / ffn_matvec_silu_kernel / the accum flag,
gpu_kernels.h:213-275): rmsnorm-apply, SwiGLU, residual-add, and the
next block's rms scale all run inside the matmul kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.models import forward, init_kv_cache, synthetic_params
from llama_cu_awq_tpu.ops.linear import qmatmul_fused
from llama_cu_awq_tpu.ops.norms import RMS_EPS
from llama_cu_awq_tpu.quant import packing
from llama_cu_awq_tpu.quant.qtensor import QTensor, to_tpu_layout


def make_qt(rng, n_in, n_out):
    w = rng.normal(size=(n_in, n_out)).astype(np.float32) * 0.05
    return to_tpu_layout(QTensor.quantize(w))


@pytest.mark.parametrize("m", [1, 4])
@pytest.mark.slow
def test_fused_kernel_matches_oracle_all_features(rng, m):
    n_in, n_out = 512, 640
    qt = make_qt(rng, n_in, n_out)
    # out_pad(640) = 640? 640 % 128 == 0 -> d_pad 640 == n_out: residual ok
    assert qt.d_pad == qt.n_out
    x = jnp.asarray(rng.normal(size=(m, n_in)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(m, n_out)), jnp.float32)
    ss = jnp.asarray(rng.uniform(0.5, 2.0, size=(m, 1)), jnp.float32)
    nw = jnp.asarray(rng.normal(size=(n_in,)), jnp.float32)

    for kwargs in (
        {},
        {"residual": res},
        {"prescale": (ss, nw)},
        {"residual": res, "emit_ss_eps": RMS_EPS},
        {"prescale": (ss, nw), "residual": res, "emit_ss_eps": RMS_EPS},
    ):
        want, want_ss = qmatmul_fused(x, qt, "dequant", out_dtype=jnp.float32,
                                      **kwargs)
        got, got_ss = qmatmul_fused(x, qt, "pallas", out_dtype=jnp.float32,
                                    **kwargs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
        if want_ss is None:
            assert got_ss is None
        else:
            np.testing.assert_allclose(np.asarray(got_ss),
                                       np.asarray(want_ss),
                                       rtol=1e-2, atol=1e-4)


def test_fused_silu_matches_oracle(rng):
    n_in, n_out = 640, 512
    qt = make_qt(rng, n_in, n_out)
    g = jnp.asarray(rng.normal(size=(2, n_in)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(2, n_in)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(2, n_out)), jnp.float32)
    want, want_ss = qmatmul_fused(g, qt, "dequant", silu_u=u, residual=res,
                                  emit_ss_eps=RMS_EPS,
                                  out_dtype=jnp.float32)
    got, got_ss = qmatmul_fused(g, qt, "pallas", silu_u=u, residual=res,
                                emit_ss_eps=RMS_EPS, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_ss), np.asarray(want_ss),
                               rtol=1e-2, atol=1e-4)


def test_fused_padded_nout_falls_back(rng):
    """Small models (out_pad(n_out) != n_out) cannot run the residual/ss
    epilogues in-kernel; qmatmul_fused must fall back, not assert."""
    qt = make_qt(rng, 512, 64)  # d_pad 128 != n_out 64
    assert qt.d_pad != qt.n_out
    x = jnp.asarray(rng.normal(size=(1, 512)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32)
    want, want_ss = qmatmul_fused(x, qt, "dequant", residual=res,
                                  emit_ss_eps=RMS_EPS,
                                  out_dtype=jnp.float32)
    got, got_ss = qmatmul_fused(x, qt, "pallas", residual=res,
                                emit_ss_eps=RMS_EPS, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_ss), np.asarray(want_ss),
                               rtol=1e-2, atol=1e-4)


def test_fused_bf16_out_dtype(rng):
    qt = make_qt(rng, 512, 512)
    x = jnp.asarray(rng.normal(size=(1, 512)), jnp.float32)
    out, _ = qmatmul_fused(x, qt, "pallas", out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16


@pytest.fixture(scope="module")
def fwd_setup():
    cfg = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=512, seq_len=64)
    params = synthetic_params(cfg, seed=3, tpu_layout=True,
                              param_dtype=jnp.float32)
    return cfg, params


def _logits(cfg, params, impl, fused, tokens):
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    lo, _ = forward(params, cfg, jnp.asarray([tokens]),
                    jnp.zeros(1, jnp.int32), cache, attn_len=32,
                    act_dtype=jnp.float32, matmul_impl=impl,
                    logits_all=True, fused=fused)
    return np.asarray(lo)


@pytest.mark.slow
def test_fused_forward_matches_unfused(fwd_setup):
    """Whole-network: fused structure (oracle + interpret kernels) vs
    the unfused oracle forward."""
    cfg, params = fwd_setup
    tokens = [1, 5, 9, 200]
    base = _logits(cfg, params, "dequant", False, tokens)
    fused_oracle = _logits(cfg, params, "dequant", True, tokens)
    fused_kernel = _logits(cfg, params, "pallas", True, tokens)
    scale = np.abs(base).max()
    assert np.abs(base - fused_oracle).max() < 2e-2 * scale
    assert np.abs(fused_oracle - fused_kernel).max() < 2e-2 * scale


@pytest.mark.slow
def test_fused_decode_steps_match_prefill(fwd_setup):
    """Fused decode through the KV cache step-by-step == fused prefill."""
    cfg, params = fwd_setup
    tokens = [1, 7, 33, 400]
    all_logits = _logits(cfg, params, "pallas", True, tokens)
    cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    steps = []
    for t, tok in enumerate(tokens):
        lo, cache = forward(params, cfg, jnp.asarray([[tok]]),
                            jnp.asarray([t], jnp.int32), cache,
                            attn_len=32, act_dtype=jnp.float32,
                            matmul_impl="pallas", fused=True)
        steps.append(np.asarray(lo[0]))
    np.testing.assert_allclose(np.stack(steps), all_logits[0],
                               rtol=5e-2, atol=5e-2)
