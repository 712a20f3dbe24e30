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
bf16-exact z+128 metadata row (packing.build_meta):

    out += (x_g @ bf16(q_g + 128) - sum(x_g) * (z_g + 128)) * s_g
        == sum_g x_g (q_g - z_g) s_g   (the reference's dequant,
                                        gpu_kernels.h:196-198)

Scale/zero metadata travels as ONE interleaved bf16 array (row 2g =
s_g, row 2g+1 = z_g+128): half the metadata HBM traffic of f32 pairs,
and the 16-row sublane granule of bf16 stays block-aligned for every
even chunk count.
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


def _accumulate(x_ref, qw_ref, meta_ref, acc, chunks):
    """Shared inner loop: unpack `chunks` pair-planar chunks and
    accumulate their contribution into acc (M, TILE_D) f32."""
    for t in range(chunks):
        words = qw_ref[t * 64:(t + 1) * 64, :]
        for p in range(4):
            g = t * 4 + p
            v = ((words >> (4 * p)) & _MASK) | _BF16_BIAS
            q = pltpu.bitcast(v, jnp.bfloat16)  # (128, TILE_D), 128+q
            xi = x_ref[:, g * 128:(g + 1) * 128]
            part = jnp.dot(xi, q, preferred_element_type=jnp.float32)
            sx = jnp.sum(xi.astype(jnp.float32), axis=1, keepdims=True)
            s = meta_ref[2 * g, :].astype(jnp.float32)
            z128 = meta_ref[2 * g + 1, :].astype(jnp.float32)
            acc = acc + (part - sx * z128[None, :]) * s[None, :]
    return acc


def _make_kernel_dinner(chunks: int, tile_d: int):
    """Grid (n-tiles, d-tiles) with d INNER and the full output row
    resident in VMEM: the qw sweep over the inner dimension reads
    consecutive HBM blocks (row-major layout), which measures at
    ~full HBM bandwidth. Used when M*d_pad*4 fits VMEM (decode)."""

    def _kernel(x_ref, qw_ref, meta_ref, o_ref):
        j = pl.program_id(0)  # n-tile (outer)
        i = pl.program_id(1)  # d-tile (inner)
        sl = pl.ds(i * tile_d, tile_d)

        @pl.when(j == 0)
        def _():
            o_ref[:, sl] = jnp.zeros((o_ref.shape[0], tile_d), jnp.float32)

        o_ref[:, sl] = _accumulate(x_ref, qw_ref, meta_ref,
                                   o_ref[:, sl], chunks)

    return _kernel


def _make_kernel_douter(chunks: int):
    """Grid (d-tiles, n-tiles) with n INNER and a (M, TILE_D) output
    block accumulated across n-tiles. Used for large-M (prefill) where
    the full output row would not fit VMEM."""

    def _kernel(x_ref, qw_ref, meta_ref, o_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] = _accumulate(x_ref, qw_ref, meta_ref, o_ref[:], chunks)

    return _kernel


def _pick_tiling(n_chunks: int, d_pad: int) -> tuple[int, int]:
    import os

    override = os.environ.get("LLAMA_INT4_TILING")
    if override:  # "tile_d,chunks" — perf-sweep escape hatch
        t, c = (int(v) for v in override.split(","))
        if d_pad % t == 0 and n_chunks % c == 0:
            return t, c
    return _pick_tiling_default(n_chunks, d_pad)


def _pick_tiling_default(n_chunks: int, d_pad: int) -> tuple[int, int]:
    """Choose (tile_d, chunks-per-step). Swept on v5e (tools/sweep_int4.py
    over the 7B decode shapes): widest tile <= 4096 that still leaves >= 2
    d-tiles wins (fewer output-column passes -> fewer meta/x re-reads),
    with the chunk count sized so a qw block is <= ~2 MB (DMA pipeline
    depth beats block size beyond that).

    The bf16 meta block has sublane = 8*chunks, which Mosaic requires to
    be a multiple of 16 (chunks even) unless the block covers the whole
    array (chunks == n_chunks).
    """
    tile_d = None
    for t in (4096, 2048, 1024, 512, 256, 128):
        if d_pad % t == 0 and (d_pad // t >= 2 or d_pad == t == 128):
            tile_d = t
            break
    if tile_d is None:
        if d_pad % 128:
            raise ValueError(f"d_pad={d_pad} not a multiple of 128")
        tile_d = d_pad  # single-tile fallback (tiny tensors)
    # largest even chunk count with a <= ~1 MB qw block; when even c=2
    # already exceeds it (wide tiles), take c=2 anyway (2 MB blocks
    # measured within noise of 1 MB at tile 4096)
    block_limit = 1 << 20
    chunks = None
    for c in (8, 4, 2):
        if n_chunks % c == 0 and c * 64 * tile_d * 4 <= block_limit:
            chunks = c
            break
    if chunks is None:
        chunks = 2 if n_chunks % 2 == 0 else n_chunks
        # odd chunk counts: whole-array block (sublane constraint:
        # 8*chunks%16==0 unless the block covers the full array)
    return tile_d, chunks


# full-output-row VMEM budget for the d-inner variant
_DINNER_OUT_BYTES = 3 << 20


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_2d(x2: jax.Array, qw, meta, *, interpret=False):
    m, n_pad = x2.shape
    rows, d_pad = qw.shape
    n_chunks = n_pad // PLANAR_BLOCK
    tile_d, chunks = _pick_tiling(n_chunks, d_pad)
    n_tiles = n_chunks // chunks
    d_tiles = d_pad // tile_d

    cost = pl.CostEstimate(
        flops=2 * m * n_pad * d_pad,
        bytes_accessed=(rows * d_pad * 4 + meta.size * 2
                        + m * n_pad * 2 + m * d_pad * 4),
        transcendentals=0,
    )
    if m * d_pad * 4 <= _DINNER_OUT_BYTES:
        return pl.pallas_call(
            _make_kernel_dinner(chunks, tile_d),
            grid=(n_tiles, d_tiles),
            in_specs=[
                pl.BlockSpec((m, chunks * PLANAR_BLOCK),
                             lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunks * 64, tile_d), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunks * 8, tile_d), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, d_pad), lambda j, i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, d_pad), jnp.float32),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(x2, qw, meta)

    return pl.pallas_call(
        _make_kernel_douter(chunks),
        grid=(d_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((m, chunks * PLANAR_BLOCK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks * 64, tile_d), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks * 8, tile_d), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_d), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d_pad), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, qw, meta)


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
    out = _int4_matmul_2d(x2, qt.qw, qt.meta, interpret=interpret)
    if qt.d_pad != qt.n_out:
        out = out[:, : qt.n_out]  # drop zero-scale padding columns
    return out.reshape(*lead, qt.n_out)
