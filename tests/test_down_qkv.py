"""down_qkv 2-stage chained kernel vs the two standalone fused kernels
it replaces (ops/pallas/down_qkv.py; VERDICT r4 item 5's cross-layer
prefetch experiment, minimal form)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.ops.linear import qmatmul_fused
from llama_cu_awq_tpu.ops.norms import RMS_EPS
from llama_cu_awq_tpu.ops.pallas.down_qkv import down_qkv_fused, supported
from llama_cu_awq_tpu.quant.qtensor import QTensor, to_tpu_layout


def make_qt(rng, n_in, n_out):
    w = rng.normal(size=(n_in, n_out)).astype(np.float32) * 0.05
    return to_tpu_layout(QTensor.quantize(w))


@pytest.mark.parametrize("m,dim,hid,qkv_out", [
    (1, 1024, 1536, 1536),   # 7B-proportioned tiny (dim < qkv row)
    (4, 1024, 1536, 1536),   # spec-verify-block m
    (1, 1024, 1024, 1024),   # equal widths
])
def test_down_qkv_matches_standalone_pair(rng, m, dim, hid, qkv_out):
    w_down = make_qt(rng, hid, dim)
    wqkv = make_qt(rng, dim, qkv_out)
    assert supported(w_down, wqkv, m)
    g = jnp.asarray(rng.normal(size=(m, hid)), jnp.float32) * 0.5
    u = jnp.asarray(rng.normal(size=(m, hid)), jnp.float32) * 0.5
    res = jnp.asarray(rng.normal(size=(m, dim)), jnp.float32)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)

    # oracle: the standalone fused pallas pair (interpret mode)
    want_x2, want_ss = qmatmul_fused(
        g.astype(jnp.bfloat16), w_down, "pallas",
        silu_u=u.astype(jnp.bfloat16), residual=res.astype(jnp.bfloat16),
        emit_ss_eps=RMS_EPS, out_dtype=jnp.bfloat16)
    want_qkv = qmatmul_fused(
        want_x2, wqkv, "pallas", prescale=(want_ss, nw),
        out_dtype=jnp.float32)[0]

    got_x2, got_ss, got_qkv = down_qkv_fused(
        g.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
        res.astype(jnp.bfloat16), w_down, wqkv, nw, eps=RMS_EPS,
        out_dtype=jnp.bfloat16, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got_x2, np.float32), np.asarray(want_x2, np.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_ss), np.asarray(want_ss),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_qkv), np.asarray(want_qkv),
                               rtol=2e-2, atol=2e-2)


def test_down_qkv_matches_dequant_oracle(rng):
    m, dim, hid, qkv_out = 1, 1024, 1536, 1536
    w_down = make_qt(rng, hid, dim)
    wqkv = make_qt(rng, dim, qkv_out)
    g = jnp.asarray(rng.normal(size=(m, hid)), jnp.float32) * 0.5
    u = jnp.asarray(rng.normal(size=(m, hid)), jnp.float32) * 0.5
    res = jnp.asarray(rng.normal(size=(m, dim)), jnp.float32)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)

    want_x2, want_ss = qmatmul_fused(
        g, w_down, "dequant", silu_u=u, residual=res,
        emit_ss_eps=RMS_EPS, out_dtype=jnp.float32)
    want_qkv = qmatmul_fused(want_x2, wqkv, "dequant",
                             prescale=(want_ss, nw),
                             out_dtype=jnp.float32)[0]

    got_x2, got_ss, got_qkv = down_qkv_fused(
        g.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
        res.astype(jnp.bfloat16), w_down, wqkv, nw, eps=RMS_EPS,
        out_dtype=jnp.bfloat16, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got_x2, np.float32), np.asarray(want_x2), rtol=3e-2,
        atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_qkv), np.asarray(want_qkv),
                               rtol=5e-2, atol=5e-2)


def test_supported_gate(rng):
    w_down = make_qt(rng, 1536, 1024)
    wqkv = make_qt(rng, 1024, 1536)
    assert supported(w_down, wqkv, 1)
    assert not supported(w_down, wqkv, 10_000)  # VMEM bound
    # tiny dims where out_pad(d) != planar_pad(d): down emits a
    # 512-wide row but qkv reads a 1024-padded one -> not chainable
    w_down_512 = make_qt(rng, 1536, 512)
    wqkv_512 = make_qt(rng, 512, 768)
    assert not supported(w_down_512, wqkv_512, 1)


def test_forward_with_chain_matches_plain(rng, monkeypatch):
    """Whole-model forward with LLAMA_TPU_DOWN_QKV=1 == the standalone
    kernel path (decode step after a short prefill)."""
    import jax
    import numpy as np

    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.io.checkpoint import random_checkpoint
    from llama_cu_awq_tpu.models import (
        forward,
        init_kv_cache,
        params_from_checkpoint,
    )

    cfg = ModelConfig(dim=1024, hidden_dim=1536, n_layers=3, n_heads=8,
                      n_kv_heads=8, vocab_size=512, seq_len=96)
    ckpt = random_checkpoint(cfg, seed=11)
    params = params_from_checkpoint(ckpt, tpu_layout=True)

    def run():
        cache = init_kv_cache(cfg, 1, 64)
        _, cache = forward(params, cfg, jnp.asarray([[5, 9, 300]]),
                           jnp.zeros(1, jnp.int32), cache, attn_len=64,
                           matmul_impl="pallas")
        logits, _ = forward(params, cfg, jnp.asarray([[42]]),
                            jnp.asarray([3], jnp.int32), cache,
                            attn_len=64, matmul_impl="pallas")
        return np.asarray(logits)

    base = run()
    monkeypatch.setenv("LLAMA_TPU_DOWN_QKV", "1")
    got = run()
    np.testing.assert_allclose(got, base, rtol=2e-2, atol=2e-2)
