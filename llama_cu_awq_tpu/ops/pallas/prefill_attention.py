"""Blockwise causal PREFILL attention Pallas kernel (flash forward).

The T>1 sibling of ops/pallas/attention_step.py: teacher-forced block
prefill (the reference has no prefill at all — prompts feed token by
token, llama2_q4.cu:462-479; this is a TPU-first axis) previously ran
the einsum path in models/llama.py:_attention, which materializes a
per-layer (B, T, Hkv, kv_mul, A) f32 score tensor — 528 MB at
T=2016/A=2048 — and staged the full window through HBM twice.

This kernel runs the standard flash/online-softmax recurrence over the
KV cache window. Heads are processed in GROUPS of G per grid step
(G = 8, or all of Hkv when it isn't 8-divisible):

  for each g in the group:
    scores (Tm, a_blk) = Q_g (Tm, D) @ K_blk[:, g]^T    Tm = T * kv_mul
    online softmax per query row, acc_g (Tm, D) += P @ V_blk[:, g]

Every dot is a dense MXU op at prefill shapes (Tm 128-512, D 128,
a_blk 256+), unlike decode where the (1, D) rows starve the MXU — which
is why the decode einsum default stays (PERFORMANCE.md round-2).

Why head GROUPS: two constraints kill the simpler layouts. A per-head
(1, a_blk, 1, D) block violates Mosaic's last-two-dims rule (1 < Hkv,
not 8-divisible); flattening the cache to (B, A, Hkv*D) and taking
(a_blk, D) column blocks is legal but reads the window in D*2 = 256-
byte strided rows — DMA granularity that measured ~2% SLOWER than the
einsum path end-to-end (v5e, 2016 tokens). A (1, a_blk, G, D) block
with G = 8 is legal ((G, D) last-two dims) and reads 8 heads' rows
contiguously — 2 KB chunks — while the in-kernel head loop reuses the
staged block G times.

Causality: key s is visible to query row r (token t = r // kv_mul) iff
s <= pos[b] + t. Per-slot early exit as in batched_attention.py: `pos`
is scalar-prefetched and the KV block index map clamps at the last
block any query of slot b can see. int8 KV plugs in natively (codes ->
bf16 exact in-kernel; per-(position, head) scales — transposed to
(B, Hkv, A, 1) so their blocks stay legal — fold into the score and
probability matrices), so quantized-cache prefill never materializes
a dequantized window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _make_kernel(n_blocks: int, a_blk: int, G: int, Tm: int,
                 kv_mul: int, D: int, scale: float, quantized: bool):
    def _kernel(*refs):
        it = iter(refs)
        pos_ref = next(it)
        q_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        ks_ref = next(it) if quantized else None
        vs_ref = next(it) if quantized else None
        o_ref = next(it)
        acc_ref = next(it)   # (G * Tm, D) f32
        m_ref = next(it)     # (G * Tm, 128) f32 running max
        l_ref = next(it)     # (G * Tm, 128) f32 running denom

        b = pl.program_id(0)
        a = pl.program_id(2)

        @pl.when(a == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG)
            l_ref[:] = jnp.zeros_like(l_ref)

        # last key any query row of this slot can see: the top row's
        # token index is (Tm-1)//kv_mul, horizon pos + that
        horizon = pos_ref[b] + (Tm - 1) // kv_mul

        @pl.when(a * a_blk <= horizon)
        def _():
            row_t = jax.lax.broadcasted_iota(
                jnp.int32, (Tm, a_blk), 0) // kv_mul
            col_s = a * a_blk + jax.lax.broadcasted_iota(
                jnp.int32, (Tm, a_blk), 1)
            valid = col_s <= pos_ref[b] + row_t
            for g in range(G):
                rows = slice(g * Tm, (g + 1) * Tm)
                q_h = q_ref[0, g]                            # (Tm, D)
                k_blk = k_ref[0][:, g].astype(jnp.bfloat16)  # (a_blk, D)
                v_blk = v_ref[0][:, g].astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    q_h, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (Tm, a_blk)
                if quantized:
                    ks = ks_ref[0, g].astype(jnp.float32)    # (a_blk, 1)
                    s = s * jnp.swapaxes(ks, 0, 1)
                s = jnp.where(valid, s * scale, _NEG)
                m_old = m_ref[rows, :1]                      # (Tm, 1)
                m_new = jnp.maximum(
                    m_old, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)               # (Tm, 1)
                p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
                l_ref[rows, :1] = l_ref[rows, :1] * alpha + jnp.sum(
                    p, axis=1, keepdims=True)
                m_ref[rows, :1] = m_new
                if quantized:
                    vs = vs_ref[0, g].astype(jnp.float32)    # (a_blk, 1)
                    p = p * jnp.swapaxes(vs, 0, 1)
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v_blk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (Tm, D)
                acc_ref[rows] = acc_ref[rows] * alpha + pv

        @pl.when(a == n_blocks - 1)
        def _():
            for g in range(G):
                rows = slice(g * Tm, (g + 1) * Tm)
                o_ref[0, g] = acc_ref[rows] / l_ref[rows, :1]

    return _kernel


def supports(T: int, H: int, D: int, A: int, n_kv: int) -> bool:
    """Shapes the kernel handles: lane-complete heads, a 128-granular
    window, sublane-complete (T * kv_mul) query rows, and a VMEM bound
    over the kernel's FULL footprint (ADVICE r4): the (G*Tm, D) f32 acc
    plus the m/l scratches — each (G*Tm, 128) f32; lanes pad to 128, so
    narrower shapes would save nothing — plus the q (bf16) and out
    (f32) blocks and worst-case double-buffered KV blocks (the a_blk
    pick in prefill_attention caps one block at 2 MB; x2 buffers x k,v
    = 8 MB). Budget: 28 MB inside the engines' 32 MB prefill
    scoped-vmem floor (engine.py _prefill_fn)."""
    if H % n_kv or D % 128 or A % 128:
        return False
    Tm = T * (H // n_kv)
    G = 8 if n_kv % 8 == 0 else n_kv
    if Tm % 8:
        return False
    # head-group legality needs no extra gate: G either equals n_kv
    # (the block covers the WHOLE head axis — no partitioning, always
    # legal) or is 8 (the chip-measured partitioned case). Per-shard TP
    # calls land on G = local n_kv when that isn't 8-divisible.
    per_row = D * 4 + 2 * 128 * 4 + D * 2 + D * 4
    return G * Tm * per_row + (8 << 20) <= (28 << 20)


def prefill_attention(q, k, v, pos, k_scale=None, v_scale=None, *,
                      attn_len: int | None = None,
                      interpret: bool = False) -> jax.Array:
    """q: (B, T, H, D); k, v: (B, A, Hkv, D) bf16 — or int8 codes with
    k_scale/v_scale (B, A, Hkv) f32; pos: (B,) first absolute position
    of the block (the caches already contain the block's own k/v).
    attn_len: static bound on pos + T (the engine's attention bucket);
    the grid only covers its blocks — the cache is read in place.
    Returns (B, T, H, D) f32.
    """
    # KV block pick runs OUTSIDE the jit (a_blk is a static arg): the
    # env override must retrace, not silently hit a stale executable
    # (code-review r5 finding). Budget: (a_blk, G, D) blocks, double-
    # buffered, 2 MB max per block -> 8 MB of KV buffering, matching
    # supports()'s bound. 1024 promoted r5: +2.8% over 512 at
    # 2016/b512 (9391 vs 9137 — half the online-softmax recurrences
    # per head). LLAMA_TPU_PFK_ABLK overrides for sweeps.
    import os

    A, n_kv = k.shape[1], k.shape[2]
    D = q.shape[3]
    G = 8 if n_kv % 8 == 0 else n_kv
    a_blk = 128
    env_blk = int(os.environ.get("LLAMA_TPU_PFK_ABLK", "0"))
    cands = (env_blk,) if env_blk else (1024, 512, 256)
    for cand in cands:
        if A % cand == 0 and cand * G * D * k.dtype.itemsize \
                <= (2 << 20):
            a_blk = cand
            break
    return _prefill_attention_jit(q, k, v, pos, k_scale, v_scale,
                                  attn_len=attn_len, a_blk=a_blk,
                                  interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "attn_len", "a_blk"))
def _prefill_attention_jit(q, k, v, pos, k_scale=None, v_scale=None, *,
                           attn_len: int | None = None, a_blk: int = 128,
                           interpret: bool = False) -> jax.Array:
    B, T, H, D = q.shape
    A, n_kv = k.shape[1], k.shape[2]
    kv_mul = H // n_kv
    Tm = T * kv_mul
    G = 8 if n_kv % 8 == 0 else n_kv
    n_groups = n_kv // G
    quantized = k_scale is not None
    n_blocks = -(-min(attn_len or A, A) // a_blk)
    scale = 1.0 / float(np.sqrt(D))

    # (B, T, H, D) -> (B, n_kv, Tm, D) with row r = t * kv_mul + g
    qk = q.reshape(B, T, n_kv, kv_mul, D).transpose(0, 2, 1, 3, 4)
    qk = qk.reshape(B, n_kv, Tm, D).astype(jnp.bfloat16)

    kernel = _make_kernel(n_blocks, a_blk, G, Tm, kv_mul, D, scale,
                          quantized)

    def last_blk(p, b):
        return (p[b] + (Tm - 1) // kv_mul) // a_blk

    def kv_map(b, h, a, p):
        # clamp at the last visible block -> repeated index elides DMA
        return (b, jnp.minimum(a, last_blk(p, b)), h, 0)

    def sc_map(b, h, a, p):
        return (b, h, jnp.minimum(a, last_blk(p, b)), 0)

    in_specs = [
        pl.BlockSpec((1, G, Tm, D), lambda b, h, a, p: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, G, D), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, G, D), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [qk, k, v]
    if quantized:
        # (B, A, Hkv) -> (B, Hkv, A, 1): trailing singleton keeps the
        # block's last-two dims legal ((a_blk, 1): full last dim)
        kst = k_scale.transpose(0, 2, 1)[..., None]
        vst = v_scale.transpose(0, 2, 1)[..., None]
        in_specs += [
            pl.BlockSpec((1, G, a_blk, 1), sc_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, a_blk, 1), sc_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [kst, vst]

    cost = pl.CostEstimate(
        flops=2 * 2 * B * n_kv * Tm * D * A,
        bytes_accessed=(2 * B * A * n_kv * D * k.dtype.itemsize
                        + B * Tm * n_kv * D * 6),
        transcendentals=B * n_kv * Tm * A)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_groups, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, Tm, D),
                               lambda b, h, a, p: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G * Tm, D), jnp.float32),
            pltpu.VMEM((G * Tm, 128), jnp.float32),
            pltpu.VMEM((G * Tm, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, Tm, D), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(pos.astype(jnp.int32), *args)
    # (B, n_kv, T, kv_mul, D) -> (B, T, n_kv, kv_mul, D) = (B, T, H, D)
    out = out.reshape(B, n_kv, T, kv_mul, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, H, D)
