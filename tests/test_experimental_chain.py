"""Parity tests for the RETIRED experimental chain/mono kernels
(tools/experiments/int4_chain.py — measured losing at every shape,
PERFORMANCE.md round-4; kept with tests so the record stays honest).
The forward()-integration tests were removed with the engine hooks."""

import importlib.util
import os as _os

_spec = importlib.util.spec_from_file_location(
    "int4_chain_experiment",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))),
        "tools", "experiments", "int4_chain.py"))
int4_chain = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(int4_chain)


import jax.numpy as jnp
import numpy as np
import pytest

from llama_cu_awq_tpu.ops.linear import qmatmul_fused
from llama_cu_awq_tpu.ops.norms import RMS_EPS
from llama_cu_awq_tpu.quant.qtensor import QTensor, to_tpu_layout

ffn_chain = int4_chain.ffn_chain
ffn_chain_supported = int4_chain.ffn_chain_supported
mono_layer = int4_chain.mono_layer
mono_supported = int4_chain.mono_supported


pytestmark = pytest.mark.slow  # integration tier (see README testing section)

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


# ---------------------------------------------------------------------------
# mono-layer (attention prefix + chain in one launch)

@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("has_qkv", [False, True])
def test_mono_layer_matches_two_kernel_path(rng, quantized, has_qkv):
    from llama_cu_awq_tpu.ops.pallas.attention_step import (attention_step,
                                                            rope_rows)
    
    B, A, H, n_kv, D = 2, 256, 4, 2, 128
    dim, hidden = H * D, 1024
    wo = make_qt(rng, dim, dim)
    w_gate_up = make_qt(rng, dim, 2 * hidden)
    w_down = make_qt(rng, hidden, dim)
    wqkv = make_qt(rng, dim, (H + 2 * n_kv) * D) if has_qkv else None
    assert mono_supported(wo, w_gate_up, w_down, B, D, A, H, n_kv, wqkv)

    qkv = jnp.asarray(
        rng.standard_normal((B, (H + 2 * n_kv) * D)), jnp.bfloat16)
    x_res = jnp.asarray(rng.standard_normal((B, dim)), jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)
    nw2 = jnp.asarray(rng.normal(size=(dim,)), jnp.float32)
    pos = jnp.asarray([3, 255], jnp.int32)
    cos2, sinm = rope_rows(pos, D, 10000.0)
    if quantized:
        k_cache = jnp.asarray(
            rng.integers(-127, 128, (B, A, n_kv, D)), jnp.int8)
        v_cache = jnp.asarray(
            rng.integers(-127, 128, (B, A, n_kv, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, A, n_kv)),
                         jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, A, n_kv)),
                         jnp.float32)
    else:
        k_cache = jnp.asarray(
            rng.standard_normal((B, A, n_kv, D)) * .3, jnp.bfloat16)
        v_cache = jnp.asarray(
            rng.standard_normal((B, A, n_kv, D)) * .3, jnp.bfloat16)
        ks = vs = None

    # two-kernel reference: attention_step then ffn_chain
    attn, kn_r, vn_r, ksn_r, vsn_r = attention_step(
        qkv, k_cache, v_cache, pos, cos2, sinm, ks, vs, n_heads=H,
        attn_len=A, interpret=True)
    attn = attn.reshape(B, dim).astype(jnp.bfloat16)
    if has_qkv:
        want_x, want_ss, want_qkv = ffn_chain(
            attn, x_res, nw, wo, w_gate_up, w_down, eps=RMS_EPS,
            wqkv_next=wqkv, attn_norm_next=nw2, interpret=True)
    else:
        want_x, want_ss = ffn_chain(attn, x_res, nw, wo, w_gate_up,
                                    w_down, eps=RMS_EPS, interpret=True)

    outs = mono_layer(
        qkv, x_res, nw, wo, w_gate_up, w_down, k_cache, v_cache, pos,
        cos2, sinm, ks, vs, n_heads=H, attn_len=A, eps=RMS_EPS,
        wqkv_next=wqkv, attn_norm_next=nw2 if has_qkv else None,
        interpret=True)
    got_x, got_ss, kn, vn, ksn, vsn = outs[:6]

    np.testing.assert_allclose(np.asarray(got_x, np.float32),
                               np.asarray(want_x, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_ss), np.asarray(want_ss),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(kn, np.float32),
                                  np.asarray(kn_r, np.float32))
    np.testing.assert_array_equal(np.asarray(vn, np.float32),
                                  np.asarray(vn_r, np.float32))
    if quantized:
        np.testing.assert_allclose(np.asarray(ksn), np.asarray(ksn_r),
                                   rtol=1e-6)
    if has_qkv:
        np.testing.assert_allclose(np.asarray(outs[6], np.float32),
                                   np.asarray(want_qkv, np.float32),
                                   rtol=4e-2, atol=4e-2)


