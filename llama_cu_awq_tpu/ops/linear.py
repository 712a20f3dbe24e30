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

from llama_cu_awq_tpu.quant.qtensor import (
    QTensor,
    QTensorTPU,
    dequant_expand,
)

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


def dense_matmul(x: jax.Array, w: jax.Array,
                 impl: str | None = None) -> jax.Array:
    """Dense matmul with f32 accumulation; w is (n_out, n_in) row-major
    like the reference's wcls (gpu_kernels.h:109-139). Operands keep
    their storage dtype (bf16 on TPU -> native MXU path).

    On TPU, small-batch bf16 GEMVs route to the Pallas streaming kernel
    (ops/pallas/dense_gemv.py) — XLA's generic batch-1 matmul leaves
    ~2.5x HBM bandwidth on the table for the 262 MB lm_head read.
    """
    impl = impl or _DEFAULT_IMPL
    if impl in ("auto", "pallas") and _on_tpu():
        from llama_cu_awq_tpu.ops.pallas.dense_gemv import (
            dense_gemv,
            supports,
        )

        if supports(x, w):
            return dense_gemv(x, w)
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
