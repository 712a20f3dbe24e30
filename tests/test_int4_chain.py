"""ffn_chain (single-launch wo+gate_up+down) vs the three-kernel
composition it replaces (models/llama._post_attention fused path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.ops.linear import qmatmul_fused
from llama_cu_awq_tpu.ops.norms import RMS_EPS
from llama_cu_awq_tpu.ops.pallas.int4_chain import (ffn_chain,
                                                    ffn_chain_supported)
from llama_cu_awq_tpu.quant.qtensor import QTensor, to_tpu_layout


def make_qt(rng, n_in, n_out):
    w = rng.normal(size=(n_in, n_out)).astype(np.float32) * 0.05
    return to_tpu_layout(QTensor.quantize(w))


def _composed(attn, x, ffn_norm, wo, w_gate_up, w_down, impl):
    """Exactly _post_attention's fused branch."""
    x, ss = qmatmul_fused(attn, wo, impl, residual=x,
                          emit_ss_eps=RMS_EPS, out_dtype=jnp.bfloat16)
    gu, _ = qmatmul_fused(x, w_gate_up, impl, prescale=(ss, ffn_norm),
                          out_dtype=jnp.bfloat16)
    g, u = jnp.split(gu, 2, axis=-1)
    x, ss = qmatmul_fused(g, w_down, impl, silu_u=u, residual=x,
                          emit_ss_eps=RMS_EPS, out_dtype=jnp.bfloat16)
    return x, ss


@pytest.mark.parametrize("m", [1, 4])
@pytest.mark.parametrize("dim,hidden", [(512, 1024), (512, 1408)])
def test_chain_matches_composition(rng, m, dim, hidden):
    wo = make_qt(rng, dim, dim)
    w_gate_up = make_qt(rng, dim, 2 * hidden)
    w_down = make_qt(rng, hidden, dim)
    assert ffn_chain_supported(wo, w_gate_up, w_down, m)

    attn = jnp.asarray(rng.normal(size=(m, dim)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(m, dim)), jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)

    want, want_ss = _composed(attn, x, nw, wo, w_gate_up, w_down,
                              "pallas")
    got, got_ss = ffn_chain(attn, x, nw, wo, w_gate_up, w_down,
                            eps=RMS_EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_ss), np.asarray(want_ss),
                               rtol=1e-2, atol=1e-4)


def test_chain_matches_dequant_oracle(rng):
    m, dim, hidden = 2, 512, 1024
    wo = make_qt(rng, dim, dim)
    w_gate_up = make_qt(rng, dim, 2 * hidden)
    w_down = make_qt(rng, hidden, dim)
    attn = jnp.asarray(rng.normal(size=(m, dim)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(m, dim)), jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)
    want, _ = _composed(attn, x, nw, wo, w_gate_up, w_down, "dequant")
    got, _ = ffn_chain(attn, x, nw, wo, w_gate_up, w_down,
                       eps=RMS_EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=4e-2, atol=4e-2)


def test_chain_3d_lead_shape(rng):
    dim, hidden = 512, 1024
    wo = make_qt(rng, dim, dim)
    w_gate_up = make_qt(rng, dim, 2 * hidden)
    w_down = make_qt(rng, hidden, dim)
    attn = jnp.asarray(rng.normal(size=(3, 1, dim)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(3, 1, dim)), jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)
    out, ss = ffn_chain(attn, x, nw, wo, w_gate_up, w_down,
                        eps=RMS_EPS, interpret=True)
    assert out.shape == (3, 1, dim) and ss.shape == (3, 1, 1)


def test_forward_with_chain(rng):
    """forward(chain=True) engages the chain kernel in the fused path
    and matches chain=False logits."""
    from llama_cu_awq_tpu.config import ModelConfig
    from llama_cu_awq_tpu.models import (forward, init_kv_cache,
                                         synthetic_params)

    cfg = ModelConfig(dim=512, hidden_dim=1408, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=512, seq_len=64)
    params = synthetic_params(cfg, seed=5, tpu_layout=True,
                              param_dtype=jnp.float32)
    tok = jnp.asarray([[7]])
    pos = jnp.zeros(1, jnp.int32)
    outs = []
    for chain in (False, True):
        cache = init_kv_cache(cfg, 1, 32)
        lo, _ = forward(params, cfg, tok, pos, cache, attn_len=32,
                        matmul_impl="pallas", chain=chain)
        outs.append(np.asarray(lo))
    a, b = outs
    assert np.abs(a - b).max() < 3e-2 * np.abs(a).max() + 3e-2


@pytest.mark.parametrize("m", [1, 3])
def test_chain4_qkv_stage(rng, m):
    """4-stage chain (with the next layer's qkv) vs the composition +
    standalone fused qkv kernel."""
    dim, hidden, qkv_dim = 512, 1024, 1024
    wo = make_qt(rng, dim, dim)
    w_gate_up = make_qt(rng, dim, 2 * hidden)
    w_down = make_qt(rng, hidden, dim)
    wqkv = make_qt(rng, dim, qkv_dim)
    assert ffn_chain_supported(wo, w_gate_up, w_down, m, wqkv)

    attn = jnp.asarray(rng.normal(size=(m, dim)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(m, dim)), jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)
    nw2 = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)

    want_x, want_ss = _composed(attn, x, nw, wo, w_gate_up, w_down,
                                "pallas")
    want_qkv, _ = qmatmul_fused(want_x, wqkv, "pallas",
                                prescale=(want_ss, nw2),
                                out_dtype=jnp.bfloat16)
    got_x, got_ss, got_qkv = ffn_chain(
        attn, x, nw, wo, w_gate_up, w_down, eps=RMS_EPS,
        wqkv_next=wqkv, attn_norm_next=nw2, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x, np.float32),
                               np.asarray(want_x, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_ss), np.asarray(want_ss),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_qkv, np.float32),
                               np.asarray(want_qkv, np.float32),
                               rtol=4e-2, atol=4e-2)
