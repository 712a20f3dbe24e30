"""Fused decode attention STEP Pallas kernel: qkv split + RoPE + KV
quantization + current-token attention + windowed attention in ONE
kernel launch per layer.

Motivation (batch-1 decode, PERFORMANCE.md "Remaining headroom"): with
the fused int4 matmul kernels, what remains between kernels is pure
XLA glue — qkv split (3 slices), RoPE on q/k (trig + mul/add chains),
per-vector int8 KV quantization (abs/max/round), the cache scatter, and
the attention einsums — dozens of sub-microsecond-payload ops whose
*latency* (not bandwidth) is partially exposed in the step schedule.
This kernel ingests the qkv projection row exactly as the fused matmul
kernel produced it and emits the attention output ready for the wo
kernel, so a decoder layer becomes kernel -> kernel -> kernel ->
kernel -> kernel with only the 4 cache row-scatters left in XLA.

It is the whole-step generalization of batched_attention.py (same
block-diagonal score/acc scheme, same online softmax, same per-slot
early exit) with three additions:

  1. RoPE in-kernel: rotate-half is a lane roll by D/2 —
     out = x * [cos|cos] + roll(x, D/2) * [-sin|sin] — so the host
     passes two (B, D) rope rows per step (amortized over all layers)
     instead of running the trig chain per layer (reference:
     RoPERotation_kernel, gpu_kernels.h:332-355, fused into the step
     the way the reference fuses k/v cache writes into its qkv GEMV,
     gpu_kernels.h:242-254).
  2. The CURRENT token's k/v never round-trips through the cache: its
     contribution enters the online-softmax recurrence as a 1-row
     block at grid step 0 (order-independence of the flash recurrence),
     processed through the *identical* code path a future step will
     use when reading it back — including int8 quantize/dequantize —
     so scores are consistent across steps. The caller scatters the
     returned row into the cache AFTER the kernel, concurrent with the
     wo matmul, removing the write->read serialization entirely.
  3. KV quantization in-kernel (parity with models.llama.quantize_kv:
     symmetric per-(position, head) int8 on the bf16-rounded rope
     output, scale = absmax/127 clamped at 1e-10).

Reference counterparts: qkv_matvec_kernel's fused cache write
(gpu_kernels.h:242-254), RoPERotation_kernel (:332-355),
mat_vec_kernel_simple / softmax / vec_mat_kernel (:142-168, 357-446,
279-329).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_cu_awq_tpu.ops.pallas.batched_attention import _pick_blk

_NEG = -1e30


def rope_rows(pos: jax.Array, head_dim: int, theta: float):
    """Per-step rope factor rows for the kernel: (cos2, sinm), each
    (B, head_dim) f32 with cos2 = [cos|cos], sinm = [-sin|sin]."""
    from llama_cu_awq_tpu.ops.rope import rope_angles

    cos, sin = rope_angles(pos, head_dim, theta)  # (B, hd/2) each
    return (jnp.concatenate([cos, cos], axis=-1),
            jnp.concatenate([-sin, sin], axis=-1))


def _make_kernel(n_blocks: int, a_blk: int, H: int, Hp: int, n_kv: int,
                 D: int, scale: float, quantized: bool, kv_dtype):
    """bf16 / int8 (quantized=True) cache variant; the nibble-packed
    int4 cache dispatches to _make_kernel_kv4 instead."""
    kv_mul = H // n_kv
    HD = n_kv * D
    half = D // 2

    def _expand_mat():
        """(n_kv, Hp) 0/1 matrix mapping kv-head cols to padded heads."""
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (n_kv, Hp), 0)
        col_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, Hp), 1) // kv_mul
        return jnp.where(kv_idx == col_kv, 1.0, 0.0)

    def _kernel(*refs):
        it = iter(refs)
        pos_ref = next(it)
        qkv_ref = next(it)
        cos_ref = next(it)
        sin_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        ks_ref = next(it) if quantized else None
        vs_ref = next(it) if quantized else None
        o_ref = next(it)
        kn_ref = next(it)
        vn_ref = next(it)
        ksn_ref = next(it) if quantized else None
        vsn_ref = next(it) if quantized else None
        qbd_ref = next(it)   # (HD, Hp) bf16 scratch
        acc_ref = next(it)   # (Hp, HD) f32
        m_ref = next(it)     # (1, Hp) f32
        l_ref = next(it)     # (1, Hp) f32

        b = pl.program_id(0)
        a = pl.program_id(1)

        def online_update(k_blk, v_blk, ks_row, vs_row, valid):
            """One flash-recurrence step over a (rows, HD) bf16 block.

            k_blk/v_blk: (rows, HD) bf16; ks_row/vs_row: (rows, n_kv)
            f32 scales (quantized only); valid: (rows, Hp) bool mask.
            """
            raw = jax.lax.dot_general(
                k_blk, qbd_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (rows, Hp)
            expand = None
            if quantized:
                ks = ks_row
                if kv_mul > 1 or Hp != n_kv:
                    expand = _expand_mat()
                    ks = jax.lax.dot_general(
                        ks, expand, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                raw = raw * ks
            s = jnp.where(valid, raw * scale, _NEG)
            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_old - m_new)                 # (1, Hp)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # (rows, Hp)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
            m_ref[:] = m_new
            if quantized:
                vs = vs_row
                if expand is not None:
                    vs = jax.lax.dot_general(
                        vs, expand, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                p = p * vs
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (Hp, HD)
            acc_ref[:] = acc_ref[:] * jnp.swapaxes(alpha, 0, 1) + pv

        @pl.when(a == 0)
        def _():
            cos = cos_ref[0]                               # (1, D) f32
            sin = sin_ref[0]

            def rope(x):  # (rows, D) f32 -> rotated f32
                return x * cos + pltpu.roll(x, half, 1) * sin

            # --- split + rope ---
            qkv_row = qkv_ref[0]                           # (1, W)
            q = qkv_row[:, :H * D].reshape(H, D).astype(jnp.float32)
            q_bf = rope(q).astype(jnp.bfloat16)
            k = qkv_row[:, H * D:(H + n_kv) * D].reshape(
                n_kv, D).astype(jnp.float32)
            # parity: apply_rope returns act dtype (bf16); the cache
            # write and quantize_kv both consume that rounded value
            k_bf = rope(k).astype(jnp.bfloat16)
            v_bf = qkv_row[:, (H + n_kv) * D:].reshape(
                n_kv, D).astype(jnp.bfloat16)

            # --- Q_bd: block-diagonal q (see batched_attention.py) ---
            qt = jnp.swapaxes(q_bf, 0, 1)                  # (D, H)
            if Hp != H:
                qt = jnp.pad(qt, ((0, 0), (0, Hp - H)))
            tiled = jnp.broadcast_to(qt[None], (n_kv, D, Hp)).reshape(
                HD, Hp)
            r_blk = jax.lax.broadcasted_iota(jnp.int32, (HD, Hp), 0) // D
            col_kv = jax.lax.broadcasted_iota(
                jnp.int32, (HD, Hp), 1) // kv_mul
            qbd_ref[:] = jnp.where(r_blk == col_kv, tiled, 0)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

            # --- new cache row (+ scales), via the kernel outputs ---
            if quantized:
                kf = k_bf.astype(jnp.float32)
                vf = v_bf.astype(jnp.float32)
                ks_new = jnp.maximum(
                    jnp.max(jnp.abs(kf), axis=1, keepdims=True) / 127.0,
                    1e-10)                                 # (n_kv, 1)
                vs_new = jnp.maximum(
                    jnp.max(jnp.abs(vf), axis=1, keepdims=True) / 127.0,
                    1e-10)
                kq = jnp.round(kf / ks_new)                # exact in bf16
                vq = jnp.round(vf / vs_new)
                kn_ref[0] = kq.astype(kv_dtype)
                vn_ref[0] = vq.astype(kv_dtype)
                ksn_ref[0] = jnp.swapaxes(ks_new, 0, 1)    # (1, n_kv)
                vsn_ref[0] = jnp.swapaxes(vs_new, 0, 1)
                # current-token contribution: identical math to a
                # future step's cache read (codes -> bf16, scale post-dot)
                online_update(
                    kq.astype(jnp.bfloat16).reshape(1, HD),
                    vq.astype(jnp.bfloat16).reshape(1, HD),
                    jnp.swapaxes(ks_new, 0, 1),
                    jnp.swapaxes(vs_new, 0, 1),
                    jnp.full((1, Hp), True))
            else:
                kn_ref[0] = k_bf.astype(kv_dtype)
                vn_ref[0] = v_bf.astype(kv_dtype)
                online_update(k_bf.reshape(1, HD), v_bf.reshape(1, HD),
                              None, None, jnp.full((1, Hp), True))

        # --- window blocks: history rows strictly below pos[b] ---
        @pl.when(a * a_blk < pos_ref[b])
        def _():
            k_blk = k_ref[0].reshape(a_blk, HD).astype(jnp.bfloat16)
            v_blk = v_ref[0].reshape(a_blk, HD).astype(jnp.bfloat16)
            row = a * a_blk + jax.lax.broadcasted_iota(
                jnp.int32, (a_blk, Hp), 0)
            online_update(
                k_blk, v_blk,
                ks_ref[0] if quantized else None,
                vs_ref[0] if quantized else None,
                row < pos_ref[b])

        @pl.when(a == n_blocks - 1)
        def _():
            acc3 = acc_ref[:].reshape(Hp, n_kv, D)
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, (Hp, n_kv, 1), 1)
            h_kv = jax.lax.broadcasted_iota(
                jnp.int32, (Hp, n_kv, 1), 0) // kv_mul
            out = jnp.sum(jnp.where(kv_idx == h_kv, acc3, 0.0), axis=1)
            l_rows = jnp.swapaxes(l_ref[:], 0, 1)          # (Hp, 1)
            o_ref[0] = (out / l_rows)[:H]

    return _kernel


def _unpack4(c, dtype):
    """int8 packed nibbles -> (lo, hi) signed int4 values in dtype;
    branch-free int32 ops (sign via the xor-bias identity)."""
    c32 = c.astype(jnp.int32)
    lo = ((c32 & 0xF) ^ 8) - 8
    hi = (((c32 >> 4) & 0xF) ^ 8) - 8
    return lo.astype(dtype), hi.astype(dtype)


def _make_kernel_kv4(n_blocks: int, a_blk: int, H: int, Hp: int,
                     n_kv: int, D: int, scale: float):
    """kv_bits=4 variant of _make_kernel: the cache arrives
    nibble-HALVES packed (models.llama.quantize_kv4 — byte i of a head
    = lane i low nibble, lane i + D/2 high nibble, scale absmax/7) and
    FLATTENED to (B, A, n_kv * D/2) int8 (lane-complete blocks);
    scores/AV run as split dots per nibble plane against two half-width
    block-diagonal Q matrices, and A·V accumulates the two output
    halves separately — no full-width window is ever materialized, same
    reason as the einsum path's split-dot layout (models/llama.py
    _attention kv4 branch, measured +35% over an interleaved unpack). Unlike the
    int8 variant, the CURRENT row's rope + quantize + pack runs in XLA
    (the caller feeds the packed row + scales as 1-row inputs): packing
    in-kernel needs a (n_kv, D/2) -> (1, n_kv*D/2) reshape, a lane-dim
    shape cast Mosaic cannot lower ("infer-vector-layout: unsupported
    shape cast", measured on v5e). The current row still enters the
    flash recurrence through the IDENTICAL unpack path a future step's
    cache read uses, so cross-step scores stay consistent."""
    kv_mul = H // n_kv
    half = D // 2
    HDh = n_kv * half

    def _expand_mat():
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (n_kv, Hp), 0)
        col_kv = jax.lax.broadcasted_iota(jnp.int32, (n_kv, Hp), 1) // kv_mul
        return jnp.where(kv_idx == col_kv, 1.0, 0.0)

    def _kernel(*refs):
        (pos_ref, qkv_ref, cos_ref, sin_ref, kn_ref, vn_ref, ksn_ref,
         vsn_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
         qlo_ref, qhi_ref, alo_ref, ahi_ref, m_ref, l_ref) = refs

        b = pl.program_id(0)
        a = pl.program_id(1)

        def online_update(k_lo, k_hi, v_lo, v_hi, ks_row, vs_row, valid):
            """Flash step over plane-split (rows, HDh) bf16 blocks;
            ks_row/vs_row: (rows, n_kv) f32 scales."""
            raw = (jax.lax.dot_general(
                       k_lo, qlo_ref[:], (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       k_hi, qhi_ref[:], (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32))  # (rows, Hp)
            expand = _expand_mat() if (kv_mul > 1 or Hp != n_kv) else None
            ks = ks_row
            if expand is not None:
                ks = jax.lax.dot_general(
                    ks, expand, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            raw = raw * ks
            s = jnp.where(valid, raw * scale, _NEG)
            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0,
                                                  keepdims=True)
            m_ref[:] = m_new
            vs = vs_row
            if expand is not None:
                vs = jax.lax.dot_general(
                    vs, expand, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            p = (p * vs).astype(jnp.bfloat16)
            ar = jnp.swapaxes(alpha, 0, 1)                   # (Hp, 1)
            alo_ref[:] = alo_ref[:] * ar + jax.lax.dot_general(
                p, v_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (Hp, HDh)
            ahi_ref[:] = ahi_ref[:] * ar + jax.lax.dot_general(
                p, v_hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(a == 0)
        def _():
            cos = cos_ref[0]
            sin = sin_ref[0]

            def rope(x):
                return x * cos + pltpu.roll(x, half, 1) * sin

            qkv_row = qkv_ref[0]
            q = qkv_row[:, :H * D].reshape(H, D).astype(jnp.float32)
            q_bf = rope(q).astype(jnp.bfloat16)

            # two half-width block-diagonal Q matrices, one per plane
            # (the reshape below keeps the 128-lane dim — legal cast)
            def qbd(qh):                                     # (H, half)
                qt = jnp.swapaxes(qh, 0, 1)                  # (half, H)
                if Hp != H:
                    qt = jnp.pad(qt, ((0, 0), (0, Hp - H)))
                tiled = jnp.broadcast_to(
                    qt[None], (n_kv, half, Hp)).reshape(HDh, Hp)
                r_blk = jax.lax.broadcasted_iota(
                    jnp.int32, (HDh, Hp), 0) // half
                col_kv = jax.lax.broadcasted_iota(
                    jnp.int32, (HDh, Hp), 1) // kv_mul
                return jnp.where(r_blk == col_kv, tiled, 0)

            qlo_ref[:] = qbd(q_bf[:, :half])
            qhi_ref[:] = qbd(q_bf[:, half:])
            alo_ref[:] = jnp.zeros_like(alo_ref)
            ahi_ref[:] = jnp.zeros_like(ahi_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

            # current row: pre-packed by the caller; the unpack here is
            # the same path a future step's cache read takes
            k_lo, k_hi = _unpack4(kn_ref[0], jnp.bfloat16)  # (1, HDh)
            v_lo, v_hi = _unpack4(vn_ref[0], jnp.bfloat16)
            online_update(k_lo, k_hi, v_lo, v_hi,
                          ksn_ref[0].astype(jnp.float32),
                          vsn_ref[0].astype(jnp.float32),
                          jnp.full((1, Hp), True))

        @pl.when(a * a_blk < pos_ref[b])
        def _():
            k_lo, k_hi = _unpack4(k_ref[0], jnp.bfloat16)  # (a_blk, HDh)
            v_lo, v_hi = _unpack4(v_ref[0], jnp.bfloat16)
            row = a * a_blk + jax.lax.broadcasted_iota(
                jnp.int32, (a_blk, Hp), 0)
            online_update(k_lo, k_hi, v_lo, v_hi, ks_ref[0], vs_ref[0],
                          row < pos_ref[b])

        @pl.when(a == n_blocks - 1)
        def _():
            # Extract each row's kv-block diagonal. A direct reshape to
            # (Hp, n_kv, half) drops the lane dim below 128 (half = 64
            # at D=128) — the same Mosaic "unsupported shape cast" the
            # pack hit — so view head PAIRS (two half-planes = 128
            # lanes) and select the row's 64-lane half with a lane
            # roll + mask instead.
            if half % 128 == 0:
                def extract(acc_ref):
                    acc3 = acc_ref[:].reshape(Hp, n_kv, half)
                    kv_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (Hp, n_kv, 1), 1)
                    h_kv = jax.lax.broadcasted_iota(
                        jnp.int32, (Hp, n_kv, 1), 0) // kv_mul
                    return jnp.sum(jnp.where(kv_idx == h_kv, acc3, 0.0),
                                   axis=1)                   # (Hp, half)

                lo, hi = extract(alo_ref), extract(ahi_ref)
                l_rows = jnp.swapaxes(l_ref[:], 0, 1)
                o_ref[0] = (jnp.concatenate([lo, hi], axis=1)
                            / l_rows)[:H]
                return
            G = n_kv // 2

            def extract128(acc_ref):
                accv = acc_ref[:].reshape(Hp, G, 128)  # lane-preserving
                g_idx = jax.lax.broadcasted_iota(
                    jnp.int32, (Hp, G, 1), 1)
                row_g = (jax.lax.broadcasted_iota(
                    jnp.int32, (Hp, G, 1), 0) // kv_mul) // 2
                return jnp.sum(jnp.where(g_idx == row_g, accv, 0.0),
                               axis=1)                 # (Hp, 128)

            lo128 = extract128(alo_ref)   # row h: lo at (kv%2)*64
            hi128 = extract128(ahi_ref)
            row_kv = jax.lax.broadcasted_iota(
                jnp.int32, (Hp, 128), 0) // kv_mul
            even = (row_kv % 2) == 0
            # lo plane into lanes 0..63, hi plane into lanes 64..127
            lo_sel = jnp.where(even, lo128, pltpu.roll(lo128, half, 1))
            hi_sel = jnp.where(even, pltpu.roll(hi128, half, 1), hi128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, 128), 1)
            out = jnp.where(lane < half, lo_sel, hi_sel)
            l_rows = jnp.swapaxes(l_ref[:], 0, 1)
            o_ref[0] = (out / l_rows)[:H]

    return _kernel


def supports(n_heads: int, n_kv: int, head_dim: int, attn_len: int) -> bool:
    return (head_dim % 128 == 0 and attn_len % 128 == 0
            and n_heads % n_kv == 0)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "attn_len", "early_exit",
                                    "interpret", "kv_bits"))
def attention_step(qkv, k_cache, v_cache, pos, cos2, sinm,
                   k_scale=None, v_scale=None, *, n_heads: int,
                   attn_len: int | None = None, early_exit: bool = True,
                   interpret: bool = False, kv_bits: int = 8):
    """One decode attention step straight from the qkv projection row.

    qkv: (B, (H + 2*Hkv) * D) float — layout [q | k | v] exactly as the
      fused qkv matmul emits it (wqkv column concat, models/llama.py).
    k_cache/v_cache: (B, A, Hkv, D) bf16 — or int8 codes with
      k_scale/v_scale (B, A, Hkv) f32. Read-only history; rows at
      pos[b] and beyond are ignored (the current row is supplied by
      qkv, not the cache).
    pos: (B,) current absolute position per slot.
    cos2/sinm: (B, D) f32 rope factor rows from rope_rows(pos, ...).
    attn_len: static bucket bound (>= every pos + 1).

    Returns (attn (B, H, D) f32, k_new (B, Hkv, D) cache-dtype, v_new,
    k_s, v_s) where k_s/v_s are (B, Hkv) f32 scales (None unless
    quantized). The caller owns scattering k_new/v_new (+ scales) into
    the cache at row pos[b].

    kv_bits=4: the caches are nibble-halves packed (B, A, Hkv, D//2)
    int8 (models.llama.quantize_kv4) with k_scale/v_scale required;
    k_new/v_new come back packed (B, Hkv, D//2).
    """
    H = n_heads
    quantized = k_scale is not None
    kv4 = kv_bits == 4
    if kv4:
        assert quantized, "kv_bits=4 requires scales"
        B, A, n_kv, Dh = k_cache.shape
        D = Dh * 2
    else:
        B, A, n_kv, D = k_cache.shape
    HD = n_kv * D
    assert qkv.shape == (B, (H + 2 * n_kv) * D), (qkv.shape, H, n_kv, D)
    kv_dtype = k_cache.dtype
    a_blk = _pick_blk(A, (HD // (2 if kv4 else 1))
                      * k_cache.dtype.itemsize)
    n_blocks = -(-min(attn_len or A, A) // a_blk)
    Hp = max(-(-H // 128) * 128, 128)
    scale = 1.0 / float(np.sqrt(D))

    if kv4:
        return _attention_step_kv4(
            qkv, k_cache, v_cache, pos, cos2, sinm, k_scale, v_scale,
            H=H, Hp=Hp, n_kv=n_kv, D=D, A=A, a_blk=a_blk,
            n_blocks=n_blocks, scale=scale, early_exit=early_exit,
            interpret=interpret)

    kernel = _make_kernel(n_blocks, a_blk, H, Hp, n_kv, D, scale,
                          quantized, kv_dtype)

    # per-slot early exit: clamp KV block maps at the last HISTORY
    # block, max(pos[b]-1, 0) // a_blk (the current token never reads
    # the cache) — Mosaic elides the repeated-block DMAs, pl.when
    # skips the compute
    if early_exit:
        def kv_map(b, a, p):
            last = jnp.maximum(p[b] - 1, 0) // a_blk
            return (b, jnp.minimum(a, last), 0, 0)

        def sc_map(b, a, p):
            last = jnp.maximum(p[b] - 1, 0) // a_blk
            return (b, jnp.minimum(a, last), 0)
    else:
        def kv_map(b, a, p):
            return (b, a, 0, 0)

        def sc_map(b, a, p):
            return (b, a, 0)

    # per-row operands go in as (B, 1, width) so each block is
    # (1, 1, width): a 2-D (1, width) block over a (B, width) array is
    # illegal for B > 1 (sublane dim 1 is neither 8-divisible nor the
    # full array dim) — the batch gate's B=4 case hit exactly that
    row = lambda b, a, p: (b, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, qkv.shape[1]), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv, D), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv, D), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [qkv[:, None], cos2.astype(jnp.float32)[:, None],
            sinm.astype(jnp.float32)[:, None], k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, a_blk, n_kv), sc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_blk, n_kv), sc_map, memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]

    out_shape = [
        jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        jax.ShapeDtypeStruct((B, n_kv, D), kv_dtype),
        jax.ShapeDtypeStruct((B, n_kv, D), kv_dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, H, D), lambda b, a, p: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_kv, D), lambda b, a, p: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_kv, D), lambda b, a, p: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if quantized:
        out_shape += [jax.ShapeDtypeStruct((B, 1, n_kv), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, 1, n_kv), row,
                                   memory_space=pltpu.VMEM)] * 2

    cost = pl.CostEstimate(
        flops=2 * 2 * B * (A + 1) * HD * Hp,
        bytes_accessed=(2 * B * A * HD * k_cache.dtype.itemsize
                        + B * qkv.shape[1] * qkv.dtype.itemsize
                        + B * H * D * 6),
        transcendentals=B * Hp * (A + 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((HD, Hp), jnp.bfloat16),   # Q_bd
            pltpu.VMEM((Hp, HD), jnp.float32),    # acc
            pltpu.VMEM((1, Hp), jnp.float32),     # running max
            pltpu.VMEM((1, Hp), jnp.float32),     # running denom
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pos.astype(jnp.int32), *args)
    if quantized:
        return (outs[0], outs[1], outs[2],
                outs[3].reshape(B, n_kv), outs[4].reshape(B, n_kv))
    return outs[0], outs[1], outs[2], None, None


def _attention_step_kv4(qkv, k_cache, v_cache, pos, cos2, sinm,
                        k_scale, v_scale, *, H, Hp, n_kv, D, A, a_blk,
                        n_blocks, scale, early_exit, interpret):
    """kv_bits=4 dispatch (see attention_step). Packed caches are
    flattened to (B, A, Hkv * D/2) so every block is lane-complete
    (a (…, 64)-lane int8 block would fight Mosaic's tiling). The
    current row's rope + int4 quantize + pack runs HERE in XLA (the
    in-kernel pack needs a lane-dim shape cast Mosaic rejects) and
    feeds the kernel as a 1-row packed block."""
    from llama_cu_awq_tpu.models.llama import quantize_kv4

    B = qkv.shape[0]
    half = D // 2
    HDh = n_kv * half
    kernel = _make_kernel_kv4(n_blocks, a_blk, H, Hp, n_kv, D, scale)

    # rope on k (lane-roll form, identical to the kernel's), bf16
    # rounding, then quantize_kv4 — the same pipeline forward()'s
    # einsum branch runs, so codes/scales match it exactly
    kf = qkv[:, H * D:(H + n_kv) * D].reshape(
        B, n_kv, D).astype(jnp.float32)
    kf = kf * cos2[:, None, :] + jnp.roll(kf, half, -1) * sinm[:, None, :]
    k_bf = kf.astype(jnp.bfloat16)
    v_bf = qkv[:, (H + n_kv) * D:].reshape(
        B, n_kv, D).astype(jnp.bfloat16)
    kn, ksn = quantize_kv4(k_bf[:, None])      # (B, 1, n_kv, half/n_kv)
    vn, vsn = quantize_kv4(v_bf[:, None])
    kn2, vn2 = kn.reshape(B, 1, HDh), vn.reshape(B, 1, HDh)
    ksn2, vsn2 = ksn.reshape(B, 1, n_kv), vsn.reshape(B, 1, n_kv)

    if early_exit:
        def kv_map(b, a, p):
            last = jnp.maximum(p[b] - 1, 0) // a_blk
            return (b, jnp.minimum(a, last), 0)

        def sc_map(b, a, p):
            last = jnp.maximum(p[b] - 1, 0) // a_blk
            return (b, jnp.minimum(a, last), 0)
    else:
        def kv_map(b, a, p):
            return (b, a, 0)

        def sc_map(b, a, p):
            return (b, a, 0)

    row = lambda b, a, p: (b, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, qkv.shape[1]), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, HDh), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, HDh), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_kv), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_kv), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, HDh), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, HDh), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv), sc_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv), sc_map, memory_space=pltpu.VMEM),
    ]
    args = [qkv[:, None], cos2.astype(jnp.float32)[:, None],
            sinm.astype(jnp.float32)[:, None],
            kn2, vn2, ksn2, vsn2,
            k_cache.reshape(B, A, HDh), v_cache.reshape(B, A, HDh),
            k_scale, v_scale]

    out_shape = [jax.ShapeDtypeStruct((B, H, D), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, H, D), lambda b, a, p: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    cost = pl.CostEstimate(
        flops=2 * 2 * B * (A + 1) * n_kv * D * Hp,
        bytes_accessed=(2 * B * A * HDh
                        + B * qkv.shape[1] * qkv.dtype.itemsize
                        + B * H * D * 6),
        transcendentals=B * Hp * (A + 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((HDh, Hp), jnp.bfloat16),  # Q_bd lo plane
            pltpu.VMEM((HDh, Hp), jnp.bfloat16),  # Q_bd hi plane
            pltpu.VMEM((Hp, HDh), jnp.float32),   # acc lo
            pltpu.VMEM((Hp, HDh), jnp.float32),   # acc hi
            pltpu.VMEM((1, Hp), jnp.float32),     # running max
            pltpu.VMEM((1, Hp), jnp.float32),     # running denom
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pos.astype(jnp.int32), *args)
    return (outs[0], kn.reshape(B, n_kv, half), vn.reshape(B, n_kv, half),
            ksn.reshape(B, n_kv), vsn.reshape(B, n_kv))
