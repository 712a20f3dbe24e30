"""Quantized matmul dispatch.

`qmatmul` is the single matmul primitive the whole network uses (the
TPU-native analog of the reference's mat_vec_kernel_int4 family,
gpu_kernels.h:171-275). Fusions the reference does with dedicated
kernels (qkv, gate+up) are done here at the *layout* level: the caller
concatenates weights along n_out and issues one matmul.

Implementations:
  "dequant" — dequantize to dense f32/bf16 and jnp.dot. The oracle path
              and CPU fallback (the role the SYCL backend plays for the
              reference, sycl/README.md:3). XLA fuses unpack+dot.
  "pallas"  — fused Pallas TPU kernel; weights stay 4-bit through HBM.
  "auto"    — pallas on TPU when the shapes allow, else dequant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from llama_cu_awq_tpu.quant.qtensor import QTensorTPU, dequant_expand

_DEFAULT_IMPL = "auto"


def set_default_matmul_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "dequant", "pallas")
    _DEFAULT_IMPL = impl


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def resolved_impl(impl: str | None = None) -> str:
    """The implementation 'auto' resolves to on this process."""
    impl = impl or _DEFAULT_IMPL
    if impl == "auto":
        return "pallas" if _on_tpu() else "dequant"
    return impl


def qmatmul(x: jax.Array, qt, impl: str | None = None) -> jax.Array:
    """x: (..., n_in) -> (..., n_out), f32 accumulation, f32 result.

    Dequantization numerics match gpu_kernels.h:196-197: per element
    w = (q - z) * s in f32. Accepts either layout: QTensorTPU routes to
    the fused Pallas kernel (interpret mode off-TPU when forced),
    QTensor to the dense dequant oracle.
    """
    impl = impl or _DEFAULT_IMPL
    if isinstance(qt, QTensorTPU):
        if impl == "auto":
            impl = "pallas" if _on_tpu() else "dequant"
        if impl == "pallas":
            from llama_cu_awq_tpu.ops.pallas.int4_matmul import int4_matmul

            return int4_matmul(x, qt, interpret=not _on_tpu())
        w = qt.dequantize(jnp.float32)
    else:
        w = dequant_expand(qt.qw, qt.zeros, qt.scales, qt.n_in)
    # HIGHEST precision: this is the parity oracle; the perf path is pallas
    return jnp.dot(x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def qmatmul_fused(x: jax.Array, qt, impl: str | None = None, *,
                  prescale=None, silu_u=None, residual=None,
                  emit_ss_eps: float | None = None,
                  out_dtype=jnp.bfloat16):
    """Fused layer-step matmul: optional rmsnorm-apply prologue
    (prescale = (ss, norm_w): x_eff = x * ss * norm_w), optional SwiGLU
    prologue (silu_u = up values: x_eff = silu(x) * up), optional
    residual-add epilogue, optional rms-scale epilogue (emit_ss_eps ->
    also return rsqrt(mean(out^2) + eps)).

    One call replaces matmul + its surrounding XLA glue — the fusion
    move the reference makes with dedicated kernel variants
    (qkv_matvec_kernel / ffn_matvec_silu_kernel / the accum flag,
    gpu_kernels.h:213-275); at TPU batch-1 decode the glue is exposed
    HBM<->VMEM latency, so fusing it into the Pallas kernel is worth
    ~25% of the step (PERFORMANCE.md).

    Returns (out, ss'); ss' is None unless emit_ss_eps is given.
    The jnp fallback implements the identical staging (bf16 effective-x
    into the dot) so it is the parity oracle for the kernel.
    """
    impl = impl or _DEFAULT_IMPL
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if isinstance(qt, QTensorTPU):
        if impl == "auto":
            impl = "pallas" if _on_tpu() else "dequant"
        if impl == "pallas":
            from llama_cu_awq_tpu.ops.pallas.int4_matmul import (
                fused_supported,
                int4_matmul_fused,
            )

            # residual/ss epilogues need the kernel's full padded output
            # row to be the real output row (d_pad == n_out); small
            # models with padded n_out take the unfused composite below
            epi_ok = (residual is None and emit_ss_eps is None) or \
                qt.d_pad == qt.n_out
            if fused_supported(qt, m) and epi_ok:
                return int4_matmul_fused(
                    x, qt, prescale=prescale, silu_u=silu_u,
                    residual=residual, emit_ss_eps=emit_ss_eps,
                    out_dtype=out_dtype, interpret=not _on_tpu())
    # unfused composite with the same numerics (large-m prefill, oracle,
    # CPU fallback): bf16 effective-x, f32 accumulate, f32 residual add
    xf = x.astype(jnp.float32)
    if prescale is not None:
        ss, norm_w = prescale
        xf = xf * ss.astype(jnp.float32) * norm_w.astype(jnp.float32)
    elif silu_u is not None:
        xf = xf * jax.nn.sigmoid(xf) * silu_u.astype(jnp.float32)
    out = qmatmul(xf.astype(jnp.bfloat16), qt, impl)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    out = out.astype(out_dtype)
    ss_out = None
    if emit_ss_eps is not None:
        of = out.astype(jnp.float32)
        ms = jnp.mean(of * of, axis=-1, keepdims=True) + emit_ss_eps
        ss_out = jax.lax.rsqrt(ms)
    return out, ss_out


def dense_matmul(x: jax.Array, w, impl: str | None = None) -> jax.Array:
    """Dense matmul with f32 accumulation; w is (n_out, n_in) row-major
    like the reference's wcls (gpu_kernels.h:109-139) — a bf16/fp16
    jax.Array or an Int8Dense (quant/int8.py, the opt-in 8-bit lm_head).

    On TPU, small-batch GEMVs route to the Pallas streaming kernel
    (ops/pallas/dense_gemv.py) — XLA's generic batch-1 matmul leaves
    ~2.5x HBM bandwidth on the table for the 262 MB lm_head read.
    """
    from llama_cu_awq_tpu.quant.int8 import Int8Dense

    impl = impl or _DEFAULT_IMPL
    scale = None
    if isinstance(w, Int8Dense):
        w, scale = w.w8, w.scale
    if impl in ("auto", "pallas") and _on_tpu():
        from llama_cu_awq_tpu.ops.pallas.dense_gemv import (
            dense_gemv,
            supports,
        )

        if supports(x, w):
            return dense_gemv(
                x, w, scale.reshape(1, -1) if scale is not None else None)
    if scale is not None:
        # same staging as the kernel: int8 codes to bf16 (exact), f32
        # accumulate, per-row scale applied to the accumulated result
        acc = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16).T,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return acc * scale.reshape(1, -1)
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
