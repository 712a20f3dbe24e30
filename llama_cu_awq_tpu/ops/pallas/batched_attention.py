"""Batched decode attention Pallas kernel (int8-native KV).

The serving-shape redesign of ops/pallas/decode_attention.py: at 16-32
slots, attention is ~57% of the decode step (PERFORMANCE.md) and both
the XLA einsum path (scores laid out (B, window, heads): n_kv of 128
lanes) and the per-head flash kernel ((1, D) x (D, blk) dots) waste the
hardware. This kernel restructures the math so every MXU op is dense:

  scores  (a_blk, H)   = K_blk (a_blk, Hkv*D) @ Q_bd (Hkv*D, Hp)
      where Q_bd is the BLOCK-DIAGONAL matrix with q[h] (128 values) in
      rows kv(h)*D..kv(h)*D+D of column h — one dot computes every
      head's scores for the block, with the attention window on the
      sublane axis and heads padded to a full 128-lane tile.
  acc     (Hp, Hkv*D) += P' (a_blk, Hp) ^T-contracted with V_blk
      (dot_general contracting the window axis) — the per-head outputs
      live on the kv-block diagonal of acc, extracted once at the end.

int8 KV plugs in natively: k codes convert to bf16 in-kernel (exact)
and the per-(position, head) scales fold into the score matrix (k) and
the probability matrix (v) — no dequantized window is ever materialized
(the engine's einsum fallback for int8 relies on XLA fusing the dequant;
a kernel reading bf16 dequantized inputs would double KV traffic).

Per-slot early exit: `pos` is a scalar-prefetch operand and the KV
block index maps clamp at `pos[b] // a_blk` — Mosaic skips the DMA
when consecutive grid steps resolve to the same block, and `pl.when`
skips the compute, so a slot only pays for the window it has actually
filled. In steady-state serving with mixed progress this roughly
halves both KV traffic and MXU work vs scanning the full window for
every slot (the reference's per-position launch sizes the grid by
`pos` the same way, `llama2_q4.cu:273`).

Softmax is the standard online/flash recurrence, carried per head as
(1, Hp) row vectors; the alpha rescale of acc is a per-ROW multiply
(rows = heads), so no lane-broadcast is needed anywhere.

Cost at 7B serving shapes (B=32, Hkv=H=32, D=128, A=512): the block-
diagonal waste is x(128/kv_mul/ ... ) — MXU work is A x HkvD x Hp per
(b, block) vs A x HkvD x 1 useful, but the kernel stays within ~1.3x of
the int8 KV DMA time, far below the einsum path's lane-waste stall.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK_TARGET_BYTES = 1 << 20
_NEG = -1e30


def _make_kernel(n_blocks: int, a_blk: int, H: int, Hp: int, n_kv: int,
                 D: int, scale: float, quantized: bool):
    kv_mul = H // n_kv

    def _kernel(*refs):
        it = iter(refs)
        pos_ref = next(it)
        q_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        ks_ref = next(it) if quantized else None
        vs_ref = next(it) if quantized else None
        o_ref = next(it)
        qbd_ref = next(it)   # (Hkv*D, Hp) bf16 scratch
        acc_ref = next(it)   # (Hp, Hkv*D) f32 scratch
        m_ref = next(it)     # (1, Hp) f32
        l_ref = next(it)     # (1, Hp) f32

        b = pl.program_id(0)
        a = pl.program_id(1)
        HD = n_kv * D

        @pl.when(a == 0)
        def _():
            # Q_bd[r, h] = q[h, r - kv(h)*D] if kv(h)*D <= r < kv(h+1)*D
            # built as tile(q^T over kv blocks) * block-diagonal mask
            qt = q_ref[0].astype(jnp.bfloat16)            # (H, D)
            qt = jnp.swapaxes(qt, 0, 1)                   # (D, H)
            if Hp != H:
                qt = jnp.pad(qt, ((0, 0), (0, Hp - H)))
            tiled = jnp.broadcast_to(qt[None], (n_kv, D, Hp)).reshape(
                HD, Hp)
            r_blk = jax.lax.broadcasted_iota(
                jnp.int32, (HD, Hp), 0) // D                 # kv block of r
            col_kv = jax.lax.broadcasted_iota(
                jnp.int32, (HD, Hp), 1) // kv_mul            # kv block of h
            qbd_ref[:] = jnp.where(r_blk == col_kv, tiled, 0)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

        @pl.when(a <= pos_ref[b] // a_blk)
        def _():
            k_blk = k_ref[0].reshape(a_blk, HD).astype(jnp.bfloat16)
            v_blk = v_ref[0].reshape(a_blk, HD).astype(jnp.bfloat16)
            raw = jax.lax.dot_general(
                k_blk, qbd_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (a_blk, Hp)
            expand = None
            if quantized:
                # per-(position, kv-head) k scales -> expand kv cols to H
                ks = ks_ref[0]                             # (a_blk, n_kv)
                if kv_mul > 1 or Hp != n_kv:
                    kv_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (n_kv, Hp), 0)
                    col_kv = jax.lax.broadcasted_iota(
                        jnp.int32, (n_kv, Hp), 1) // kv_mul
                    expand = jnp.where(kv_idx == col_kv, 1.0, 0.0)
                    ks = jax.lax.dot_general(
                        ks, expand, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (a_blk, Hp)
                raw = raw * ks
            s = raw * scale
            row = a * a_blk + jax.lax.broadcasted_iota(
                jnp.int32, (a_blk, Hp), 0)
            valid = row <= pos_ref[b]
            s = jnp.where(valid, s, _NEG)

            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_old - m_new)                 # (1, Hp)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # (a_blk, Hp)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0,
                                                  keepdims=True)
            m_ref[:] = m_new
            if quantized:
                vs = vs_ref[0]
                if expand is not None:
                    vs = jax.lax.dot_general(
                        vs, expand, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                p = p * vs                                 # fold v scales
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (Hp, HD)
            alpha_rows = jnp.swapaxes(alpha, 0, 1)         # (Hp, 1)
            acc_ref[:] = acc_ref[:] * alpha_rows + pv

        @pl.when(a == n_blocks - 1)
        def _():
            # rows = heads; extract each row's kv-block diagonal
            acc3 = acc_ref[:].reshape(Hp, n_kv, D)
            kv_idx = jax.lax.broadcasted_iota(
                jnp.int32, (Hp, n_kv, 1), 1)
            h_kv = jax.lax.broadcasted_iota(
                jnp.int32, (Hp, n_kv, 1), 0) // kv_mul
            out = jnp.sum(jnp.where(kv_idx == h_kv, acc3, 0.0),
                          axis=1)                          # (Hp, D)
            l_rows = jnp.swapaxes(l_ref[:], 0, 1)          # (Hp, 1)
            o_ref[0] = (out / l_rows)[:H]

    return _kernel


def _pick_blk(A: int, bytes_per_row: int) -> int:
    target = max(_BLK_TARGET_BYTES // bytes_per_row, 128)
    best = 128
    for blk in range(128, min(A, target) + 1, 128):
        if A % blk == 0:
            best = blk
    return best


def supports(q: jax.Array, k: jax.Array) -> bool:
    B, H, D = q.shape
    A, n_kv = k.shape[1], k.shape[2]
    return D % 128 == 0 and A % 128 == 0 and H % n_kv == 0


@functools.partial(jax.jit,
                   static_argnames=("interpret", "early_exit",
                                    "attn_len"))
def batched_decode_attention(q, k, v, pos, k_scale=None, v_scale=None, *,
                             interpret: bool = False,
                             early_exit: bool = True,
                             attn_len: int | None = None) -> jax.Array:
    """q: (B, H, D); k, v: (B, A, Hkv, D) bf16 — or int8 codes with
    k_scale/v_scale (B, A, Hkv) f32; pos: (B,) -> (B, H, D) f32.

    attn_len: static upper bound on every pos+1 (the engine's attention
    bucket): the grid only covers ceil(attn_len / a_blk) blocks of the
    cache — the cache is read in place, never sliced/copied.
    early_exit=False pins static block index maps (every slot scans the
    whole grid) — kept for A/B measurement of the scalar-prefetch
    scheduling cost."""
    B, H, D = q.shape
    A, n_kv = k.shape[1], k.shape[2]
    HD = n_kv * D
    quantized = k_scale is not None
    a_blk = _pick_blk(A, HD * k.dtype.itemsize)
    n_blocks = -(-min(attn_len or A, A) // a_blk)
    Hp = max(-(-H // 128) * 128, 128)
    scale = 1.0 / float(np.sqrt(D))

    kernel = _make_kernel(n_blocks, a_blk, H, Hp, n_kv, D, scale,
                          quantized)

    # KV block index maps clamp at each slot's last needed block:
    # Mosaic elides the DMA when the block index repeats between
    # consecutive grid steps, and the kernel's pl.when skips the
    # compute — per-slot early exit without manual DMA.
    if early_exit:
        def kv_map(b, a, p):
            return (b, jnp.minimum(a, p[b] // a_blk), 0, 0)

        def sc_map(b, a, p):
            return (b, jnp.minimum(a, p[b] // a_blk), 0)
    else:
        def kv_map(b, a, p):
            return (b, a, 0, 0)

        def sc_map(b, a, p):
            return (b, a, 0)

    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, a, p: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv, D), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv, D), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, a_blk, n_kv), sc_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_blk, n_kv), sc_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]

    cost = pl.CostEstimate(
        flops=2 * 2 * B * A * HD * Hp,
        bytes_accessed=2 * B * A * HD * k.dtype.itemsize + B * H * D * 6,
        transcendentals=B * Hp * A)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), lambda b, a, p: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HD, Hp), jnp.bfloat16),   # Q_bd
            pltpu.VMEM((Hp, HD), jnp.float32),    # acc
            pltpu.VMEM((1, Hp), jnp.float32),     # running max
            pltpu.VMEM((1, Hp), jnp.float32),     # running denom
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pos.astype(jnp.int32), *args)
