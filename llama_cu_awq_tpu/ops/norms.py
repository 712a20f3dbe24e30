"""RMSNorm (reference: gpu_kernels.h:72-105).

fp32 accumulation, eps 1e-5 added to the mean of squares (not inside a
max), scale by the elementwise weight, output cast back to the
activation dtype.
"""

import jax.numpy as jnp
from jax import lax

RMS_EPS = 1e-5


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = RMS_EPS):
    """x: (..., dim); weight: (dim,). Returns same dtype as x."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    out = xf * lax.rsqrt(ms) * weight.astype(jnp.float32)
    return out.astype(x.dtype)
