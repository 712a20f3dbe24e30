"""Blockwise (flash-style) decode attention Pallas kernel.

The TPU-native re-design of the reference's three decode-attention
kernels (q.K^T mat_vec_kernel_simple, softmax_kernel[_no_smem], A.V
vec_mat_kernel — gpu_kernels.h:142-168,357-446,279-329): ONE pass over
the KV cache with an online softmax, so K and V stream through VMEM at
HBM bandwidth exactly once and no (heads, seq) score tensor ever
round-trips through HBM. This also removes the reference's 8K-sequence
shared-memory softmax cliff (common.h:6) — the online softmax is
O(block) in VMEM at any sequence length.

Decode shape: one query position per sequence (T == 1).
  q:   (B, H, D)        post-RoPE queries
  k,v: (B, A, Hkv, D)   cache slices (A = attention bucket)
  pos: (B,) int32       current position (attend to rows <= pos)
  out: (B, H, D) f32

GQA: H = Hkv * kv_mul; query head group g attends to kv head g.
Numerics: f32 scores/softmax/accumulation throughout (the reference
stages scores through fp16; f32 is strictly tighter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# K/V stream in ~1 MB row-blocks (A_BLK rows of Hkv*D bf16)
_BLK_TARGET_BYTES = 1 << 20
_NEG = -1e30


def _make_kernel(n_blocks: int, a_blk: int, kv_mul: int, scale: float):
    def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                acc_ref, m_ref, l_ref):
        a = pl.program_id(1)

        @pl.when(a == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

        pos = pos_ref[pl.program_id(0)]
        n_kv = k_ref.shape[2]
        d = k_ref.shape[3]
        # merge (Hkv, D) into lanes: per-head access becomes a cheap
        # 128-aligned lane slice instead of a strided sublane gather
        k_blk = k_ref[0].reshape(a_blk, n_kv * d)
        v_blk = v_ref[0].reshape(a_blk, n_kv * d)
        cdt = k_blk.dtype  # bf16 cache -> bf16 MXU operands (f32 in tests)
        row = a * a_blk + jax.lax.broadcasted_iota(jnp.int32, (1, a_blk), 1)
        valid = row <= pos  # (1, a_blk)

        for j in range(n_kv):
            qj = q_ref[0, j * kv_mul:(j + 1) * kv_mul, :]  # (kv_mul, D)
            kj = k_blk[:, j * d:(j + 1) * d]               # (a_blk, D)
            s = jax.lax.dot_general(
                qj.astype(cdt), kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid, s, _NEG)                  # (kv_mul, a_blk)
            sl = slice(j * kv_mul, (j + 1) * kv_mul)
            m_old = m_ref[sl, :]                           # (kv_mul, 128)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)                 # (kv_mul, 128)
            p = jnp.where(valid, jnp.exp(s - m_new[:, :1]), 0.0)
            l_ref[sl, :] = l_ref[sl, :] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(cdt), v_blk[:, j * d:(j + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (kv_mul, D)
            acc_ref[sl, :] = acc_ref[sl, :] * alpha[:, :1] + pv
            m_ref[sl, :] = m_new

        @pl.when(a == n_blocks - 1)
        def _():
            o_ref[0] = acc_ref[:] / l_ref[:, :1]

    return _kernel


def _pick_blk(A: int, kv_bytes_per_row: int) -> int:
    target = max(_BLK_TARGET_BYTES // kv_bytes_per_row, 128)
    best = 128
    for blk in range(128, min(A, target) + 1, 128):
        if A % blk == 0:
            best = blk
    return best


def supports(q: jax.Array, k: jax.Array) -> bool:
    B, H, D = q.shape
    A, n_kv = k.shape[1], k.shape[2]
    return D % 128 == 0 and A % 128 == 0 and H % n_kv == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     pos: jax.Array, *, interpret: bool = False
                     ) -> jax.Array:
    """q: (B, H, D); k, v: (B, A, Hkv, D); pos: (B,) -> (B, H, D) f32."""
    B, H, D = q.shape
    A, n_kv = k.shape[1], k.shape[2]
    kv_mul = H // n_kv
    a_blk = _pick_blk(A, n_kv * D * k.dtype.itemsize)
    n_blocks = A // a_blk
    scale = 1.0 / float(np.sqrt(D))

    grid = (B, n_blocks)
    kernel = _make_kernel(n_blocks, a_blk, kv_mul, scale)
    cost = pl.CostEstimate(
        flops=4 * B * H * D * A,
        bytes_accessed=2 * B * A * n_kv * D * k.dtype.itemsize
        + B * H * D * 6,
        transcendentals=B * H * A)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole (B,) vector in SMEM (rank-1 blocks must cover the
            # array); the kernel indexes it by the batch grid coordinate
            pl.BlockSpec((B,), lambda b, a: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, D), lambda b, a: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_blk, n_kv, D), lambda b, a: (b, a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_blk, n_kv, D), lambda b, a: (b, a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, a: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, D), jnp.float32),    # acc
            pltpu.VMEM((H, 128), jnp.float32),  # running max (lane-bcast)
            pltpu.VMEM((H, 128), jnp.float32),  # running denom
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pos.astype(jnp.int32), q, k, v)
