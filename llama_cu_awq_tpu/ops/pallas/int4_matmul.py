"""Fused w4-g128 dequant matmul Pallas kernel.

The TPU-native re-design of the reference's int4 GEMV core
(get_mat_vec_int4, gpu_kernels.h:171-210): weights stay nibble-packed in
HBM and are the only dominant traffic — the property that puts the CUDA
reference at ~speed-of-light on a 4090 (SURVEY.md §6).

Unpack trick (see quant/packing.py "pair-planar" layout): bits 4p and
4p+16 of each packed word are extracted together with ONE shift+mask
(mask 0x000F000F); OR-ing 0x4300_4300 forms the bf16 bit patterns of
(128 + q) in both 16-bit halves (exact: 8 mantissa bits); a free bitcast
u32(64,d)->bf16(128,d) lands the rows hardware-interleaved — which the
layout makes exactly one contiguous 128-row quantization group. Net VPU
cost: 3 ops per 2 weights. Each pair-plane feeds one MXU dot with f32
accumulation; the +128 bias and the AWQ zero-point cancel via the
precomputed zs = (z + 128) * s:

    out += (x_g @ bf16(q_g + 128)) * s_g - sum(x_g) * zs_g
        == sum_g x_g (q_g - z_g) s_g   (the reference's dequant,
                                        gpu_kernels.h:196-198)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_cu_awq_tpu.quant.packing import PLANAR_BLOCK
from llama_cu_awq_tpu.quant.qtensor import QTensorTPU

_MASK = 0x000F000F
_BF16_BIAS = 0x43004300  # bf16(128+q) = 0x4300 | q in each 16-bit half


def _make_kernel(chunks: int):
    def _kernel(x_ref, qw_ref, s_ref, zs_ref, o_ref):
        """One (d-tile, n-tile) grid step.

        x_ref:  (M, chunks*512) bf16
        qw_ref: (chunks*64, TILE_D) u32
        s_ref:  (chunks*4, TILE_D) f32 — per-group scales
        zs_ref: (chunks*4, TILE_D) f32 — per-group (zero+128)*scale
        o_ref:  (M, TILE_D) f32 — accumulated across n-tiles
        """
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        acc = o_ref[:]
        for t in range(chunks):
            words = qw_ref[t * 64:(t + 1) * 64, :]
            for p in range(4):
                g = t * 4 + p
                v = ((words >> (4 * p)) & _MASK) | _BF16_BIAS
                q = pltpu.bitcast(v, jnp.bfloat16)  # (128, TILE_D), 128+q
                xi = x_ref[:, g * 128:(g + 1) * 128]
                part = jnp.dot(xi, q, preferred_element_type=jnp.float32)
                sx = jnp.sum(xi.astype(jnp.float32), axis=1, keepdims=True)
                acc = acc + part * s_ref[g, :][None, :] \
                    - sx * zs_ref[g, :][None, :]
        o_ref[:] = acc

    return _kernel


def _pick_tiling(n_chunks: int, d: int) -> tuple[int, int]:
    """Choose (tile_d, chunks-per-step) maximizing the qw DMA block size
    within a ~3 MB VMEM budget (double-buffered by Pallas).

    Constraints: tile_d | d; chunks | n_chunks; the scales/zs blocks have
    sublane = 4*chunks, which Mosaic requires to be a multiple of 8 (so
    chunks must be even) unless the block covers the whole array
    (chunks == n_chunks).
    """
    best = None
    for tile_d in (1024, 512, 256, 128):
        if d % tile_d:
            continue
        budget = max(1, (3 << 20) // (64 * tile_d * 4))
        for c in range(min(budget, n_chunks), 0, -1):
            if n_chunks % c:
                continue
            if c % 2 and c != n_chunks:
                continue
            score = c * 64 * tile_d
            if best is None or score > best[0]:
                best = (score, tile_d, c)
            break
    if best is None:
        raise ValueError(f"n_out={d} not a multiple of 128")
    return best[1], best[2]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_2d(x2: jax.Array, qw, scales, zs, *, interpret=False):
    m, n_pad = x2.shape
    rows, d = qw.shape
    n_chunks = n_pad // PLANAR_BLOCK
    tile_d, chunks = _pick_tiling(n_chunks, d)
    n_tiles = n_chunks // chunks
    d_tiles = d // tile_d

    return pl.pallas_call(
        _make_kernel(chunks),
        grid=(d_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((m, chunks * PLANAR_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks * 64, tile_d), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks * 4, tile_d), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks * 4, tile_d), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_d), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_pad * d,
            bytes_accessed=rows * d * 4 + m * n_pad * 2 + m * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, qw, scales, zs)


def int4_matmul(x: jax.Array, qt: QTensorTPU, *,
                interpret: bool = False) -> jax.Array:
    """x: (..., n_in) any float dtype -> (..., n_out) f32."""
    lead = x.shape[:-1]
    n_in = x.shape[-1]
    assert n_in == qt.n_in, (n_in, qt.n_in)
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, n_in).astype(jnp.bfloat16)
    if qt.n_pad != n_in:
        x2 = jnp.pad(x2, ((0, 0), (0, qt.n_pad - n_in)))
    out = _int4_matmul_2d(x2, qt.qw, qt.scales, qt.zs, interpret=interpret)
    return out.reshape(*lead, qt.n_out)
