"""Per-output-channel symmetric int8 weights for the dense lm_head.

A TPU-native capability extension (opt-in, off by default): the lm_head
is the one unquantized weight on the per-token critical path of the
reference design (mat_vec_kernel on fp16 wcls, gpu_kernels.h:109-139 —
262 MB/token at 7B, ~7% of the decode HBM budget). Symmetric per-row
int8 (scale = amax/127 per vocab row) halves that read with negligible
quality cost; dequantization fuses into the GEMV epilogue.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Int8Dense(NamedTuple):
    """Row-major (n_out, n_in) dense weight as int8 codes + per-row f32
    scales; logically w[v, d] = w8[v, d] * scale[v, 0]."""

    w8: jax.Array     # (n_out, n_in) int8
    scale: jax.Array  # (n_out, 1) f32

    @property
    def shape(self):
        return self.w8.shape

    @property
    def dtype(self):
        # activation staging dtype for matmul operands (bf16 MXU path)
        return jnp.bfloat16

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.w8.astype(jnp.float32) * self.scale).astype(dtype)


def quantize_dense_int8(w: jax.Array) -> Int8Dense:
    """w: (n_out, n_in) float -> Int8Dense. |w - q*s| <= s/2 per element."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.round(wf / s).astype(jnp.int8)
    return Int8Dense(q, s)
