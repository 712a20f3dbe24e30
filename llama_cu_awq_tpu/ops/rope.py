"""Rotary position embedding, half-rotation (HF Llama) convention.

Matches the reference kernel (gpu_kernels.h:332-355): pair (i, i+hd/2)
rotates by angle pos * theta^(-2i/hd); fp32 trig; applied to all query
heads and the kv heads.
"""

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, head_dim: int, theta: float):
    """positions: (...,) int -> cos, sin of shape (..., head_dim//2), f32."""
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0
                             / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float):
    """x: (..., T, n_heads, head_dim); positions: broadcastable to (..., T).

    Returns x with each head's (i, i+hd/2) pair rotated, same dtype.
    """
    head_dim = x.shape[-1]
    cos, sin = rope_angles(positions, head_dim, theta)  # (..., T, hd/2)
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    x0 = xf[..., : head_dim // 2]
    x1 = xf[..., head_dim // 2:]
    out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.astype(x.dtype)
