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


def _mdma_prologue(qw_hbm, meta_hbm, qw_buf, meta_buf, sem, k, *,
                   chunks: int, tile_d: int, d_tiles: int, total: int,
                   n_buf: int):
    """Manual double/deep-buffered weight streaming (HBM -> VMEM scratch),
    replacing the auto-pipeline's BlockSpec DMAs for qw/meta. The inputs
    arrive with memory_space=ANY, so XLA's memory-space-assignment pass
    has NOTHING to stage around the kernel — the experiment PERFORMANCE.md
    round-2 identified: MSA staging slices + slice-done waits were ~1.4 ms
    of the 5.3 ms batch-1 step, but bounded staging also pre-warms each
    kernel's DMA pipeline, so this variant must beat that trade on chip.

    Block t of the flat d-inner grid walk (t = j * d_tiles + i) occupies
    scratch slot t % n_buf; step k waits slot k % n_buf and tops up the
    pipeline by starting block k + n_buf - 1. Returns ref views of the
    current block's qw/meta scratch."""

    def dma_pair(t, slot):
        jj = t // d_tiles
        ii = t % d_tiles
        qsrc = qw_hbm.at[pl.ds(jj * (chunks * 64), chunks * 64),
                         pl.ds(ii * tile_d, tile_d)]
        msrc = meta_hbm.at[pl.ds(jj * (chunks * 8), chunks * 8),
                           pl.ds(ii * tile_d, tile_d)]
        return (pltpu.make_async_copy(qsrc, qw_buf.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(msrc, meta_buf.at[slot],
                                      sem.at[slot, 1]))

    @pl.when(k == 0)
    def _():
        for t in range(min(n_buf, total)):
            for c in dma_pair(t, t):
                c.start()

    @pl.when((k > 0) & (k + n_buf - 1 < total))
    def _():
        t = k + n_buf - 1
        for c in dma_pair(t, t % n_buf):
            c.start()

    slot = k % n_buf
    for c in dma_pair(k, slot):
        c.wait()
    return qw_buf.at[slot], meta_buf.at[slot]


def _make_kernel_dinner_mdma(chunks: int, tile_d: int, d_tiles: int,
                             total: int, n_buf: int):
    """Manual-DMA version of the d-inner kernel (see _mdma_prologue)."""

    def _kernel(x_ref, qw_hbm, meta_hbm, o_ref, qw_buf, meta_buf, sem):
        j = pl.program_id(0)
        i = pl.program_id(1)
        k = j * d_tiles + i
        qw_ref, meta_ref = _mdma_prologue(
            qw_hbm, meta_hbm, qw_buf, meta_buf, sem, k, chunks=chunks,
            tile_d=tile_d, d_tiles=d_tiles, total=total, n_buf=n_buf)
        sl = pl.ds(i * tile_d, tile_d)

        @pl.when(j == 0)
        def _():
            o_ref[:, sl] = jnp.zeros((o_ref.shape[0], tile_d), jnp.float32)

        o_ref[:, sl] = _accumulate(x_ref, qw_ref, meta_ref,
                                   o_ref[:, sl], chunks)

    return _kernel


def _mdma_n_buf(n_chunks: int | None = None,
                d_pad: int | None = None) -> int:
    """0 = auto-pipeline (default); N>=2 = manual-DMA streaming with an
    N-deep scratch ring (LLAMA_INT4_MANUAL_DMA=N; N=1 coerces to 2).
    Two forms, mirroring LLAMA_INT4_TILING's sweep escape hatches:
      "N"                — every int4 kernel streams with an N-ring
      "nc:dp:N[;...]"    — exact-shape overrides keyed by (n_chunks,
        d_pad), so a per-PROJECTION hybrid (e.g. ring only for gate_up)
        is one env var away; unlisted shapes keep the auto-pipeline
    TPU-only: the CPU interpreters don't carry cross-grid-step DMA
    semaphore state (multi-step grids hang), and tests force interpret
    mode — a globally-exported env var must not reach them."""
    import os

    raw = os.environ.get("LLAMA_INT4_MANUAL_DMA", "0") or "0"
    if ":" in raw:
        v = 0
        for ent in raw.split(";"):
            nc, dp, n = (int(s) for s in ent.split(":"))
            if (nc, dp) == (n_chunks, d_pad):
                v = n
                break
    else:
        v = int(raw)
    if not v:
        return 0
    from llama_cu_awq_tpu.ops.linear import _on_tpu

    return max(v, 2) if _on_tpu() else 0


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


# Per-shape tiling winners from on-chip sweeps (tools/sweep_int4.py)
# where they beat _pick_tiling_default's power-of-two heuristic.
# Keyed by (n_chunks, d_pad); v5e, round-2 sweep: the 13B projections
# gained 5-17% per kernel from non-power-of-2 tiles.
_TUNED_TILING = {
    (10, 15360): (1920, 2),   # 13B qkv   (134.2 us vs 146.7)
    (10, 5120): (2560, 2),    # 13B o     ( 98.5 us vs 103.4)
    (10, 27648): (2304, 2),   # 13B gate_up (182.4 us vs 219.7)
    (28, 5120): (2560, 4),    # 13B down  (133.9 us vs 150.7)
}


def _pick_tiling(n_chunks: int, d_pad: int) -> tuple[int, int]:
    import os

    override = os.environ.get("LLAMA_INT4_TILING")
    if override:
        # two forms (perf-sweep escape hatches):
        #   "tile_d,chunks"                   — applies wherever divisible
        #   "nc:dp:tile_d:chunks[;...]"       — exact-shape overrides, so
        #     an end-to-end sweep can retile ONE projection (div-based
        #     overrides confound: tile 2560 hits 13B qkv AND o AND down)
        if ":" in override:
            for ent in override.split(";"):
                nc, dp, t, c = (int(v) for v in ent.split(":"))
                if (nc, dp) == (n_chunks, d_pad) and d_pad % t == 0 \
                        and n_chunks % c == 0:
                    return t, c
        else:
            t, c = (int(v) for v in override.split(","))
            if d_pad % t == 0 and n_chunks % c == 0:
                return t, c
    tuned = _TUNED_TILING.get((n_chunks, d_pad))
    if tuned is not None:
        t, c = tuned
        if d_pad % t == 0 and n_chunks % c == 0 and c % 2 == 0:
            return tuned
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


@functools.partial(jax.jit, static_argnames=("interpret", "manual_dma"))
def _int4_matmul_2d(x2: jax.Array, qw, meta, *, interpret=False,
                    manual_dma=0):
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
        if manual_dma and chunks % 2 == 0:
            # chunks must be even so the meta slice offset (chunks*8)
            # keeps bf16's 16-row sublane granule
            return pl.pallas_call(
                _make_kernel_dinner_mdma(chunks, tile_d, d_tiles,
                                         n_tiles * d_tiles, manual_dma),
                grid=(n_tiles, d_tiles),
                in_specs=[
                    pl.BlockSpec((m, chunks * PLANAR_BLOCK),
                                 lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((m, d_pad), lambda j, i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, d_pad), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((manual_dma, chunks * 64, tile_d),
                               jnp.uint32),
                    pltpu.VMEM((manual_dma, chunks * 8, tile_d),
                               jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((manual_dma, 2)),
                ],
                cost_estimate=cost,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")),
                interpret=interpret,
            )(x2, qw, meta)
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
    out = _int4_matmul_2d(
        x2, qt.qw, qt.meta, interpret=interpret,
        manual_dma=_mdma_n_buf(qt.n_pad // PLANAR_BLOCK, qt.d_pad))
    if qt.d_pad != qt.n_out:
        out = out[:, : qt.n_out]  # drop zero-scale padding columns
    return out.reshape(*lead, qt.n_out)


# ---------------------------------------------------------------------------
# fused layer-step variant
#
# Decode at batch-1 is LATENCY-bound between kernels: the XLA glue ops
# around each matmul (rmsnorm, silu*up, residual adds) each cost an
# exposed HBM<->VMEM round-trip of the (1, dim) activation — profiled at
# ~1.5 ms of the 5.6 ms step (tools/trace_summary.py). This variant
# pulls the glue INTO the matmul kernel, the same fusion move the
# reference makes with its dedicated qkv / ffn_silu / accumulate kernel
# variants (gpu_kernels.h:213-275):
#
#   prologue  x_eff = x * ss * norm_w          (fused rmsnorm apply)
#          or x_eff = silu(x) * u              (fused SwiGLU gate)
#   matmul    acc  += x_eff @ W4               (pair-planar dequant dots)
#   epilogue  out   = (acc + residual).astype(out_dtype)
#             ss'   = rsqrt(mean(out^2) + eps) (next block's rms scale)
#
# so a decoder layer becomes kernel->attention->kernel->kernel with only
# rope/attention math between kernels, and the rms scale chains from one
# kernel's epilogue to the next's prologue as a (m, 1) scalar.


def _accumulate_glue(x_ref, u_ref, ss_ref, nw_ref, qw_ref, meta_ref, acc,
                     chunks, *, has_norm: bool, has_silu: bool):
    """Fused-variant inner loop: prologue (rmsnorm-apply or SwiGLU gate)
    + pair-planar dequant dots, accumulated into acc (M, TILE_D) f32."""
    for t in range(chunks):
        words = qw_ref[t * 64:(t + 1) * 64, :]
        for p in range(4):
            g = t * 4 + p
            gsl = pl.ds(g * 128, 128)
            v = ((words >> (4 * p)) & _MASK) | _BF16_BIAS
            q = pltpu.bitcast(v, jnp.bfloat16)
            xi = x_ref[:, gsl]
            if has_norm:
                xi = (xi.astype(jnp.float32) * ss_ref[:]
                      * nw_ref[:, gsl]).astype(jnp.bfloat16)
            elif has_silu:
                gf = xi.astype(jnp.float32)
                xi = (gf * jax.nn.sigmoid(gf)
                      * u_ref[:, gsl].astype(jnp.float32)
                      ).astype(jnp.bfloat16)
            part = jnp.dot(xi, q, preferred_element_type=jnp.float32)
            sx = jnp.sum(xi.astype(jnp.float32), axis=1, keepdims=True)
            s = meta_ref[2 * g, :].astype(jnp.float32)
            z128 = meta_ref[2 * g + 1, :].astype(jnp.float32)
            acc = acc + (part - sx * z128[None, :]) * s[None, :]
    return acc


def _make_kernel_fused(chunks: int, tile_d: int, n_tiles: int,
                       d_tiles: int, *, has_norm: bool, has_silu: bool,
                       has_res: bool, emit_ss: bool, n_real: int,
                       eps: float, out_dtype):
    def _kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        u_ref = next(it) if has_silu else None
        ss_ref = next(it) if has_norm else None
        nw_ref = next(it) if has_norm else None
        qw_ref = next(it)
        meta_ref = next(it)
        res_ref = next(it) if has_res else None
        o_ref = next(it)
        sso_ref = next(it) if emit_ss else None
        acc_ref = next(it)

        j = pl.program_id(0)  # n-tile (outer)
        i = pl.program_id(1)  # d-tile (inner)
        sl = pl.ds(i * tile_d, tile_d)

        @pl.when(j == 0)
        def _():
            acc_ref[:, sl] = jnp.zeros((acc_ref.shape[0], tile_d),
                                       jnp.float32)

        acc_ref[:, sl] = _accumulate_glue(
            x_ref, u_ref, ss_ref, nw_ref, qw_ref, meta_ref,
            acc_ref[:, sl], chunks, has_norm=has_norm, has_silu=has_silu)

        @pl.when((j == n_tiles - 1) & (i == d_tiles - 1))
        def _():
            val = acc_ref[:]
            if has_res:
                val = val + res_ref[:].astype(jnp.float32)
            out = val.astype(out_dtype)
            o_ref[:] = out
            if emit_ss:
                of = out.astype(jnp.float32)
                ssq = jnp.sum(of * of, axis=1, keepdims=True)
                sso_ref[:] = jax.lax.rsqrt(ssq / n_real + eps)

    return _kernel


def _make_kernel_fused_mdma(chunks: int, tile_d: int, n_tiles: int,
                            d_tiles: int, *, has_norm: bool,
                            has_silu: bool, has_res: bool, emit_ss: bool,
                            n_real: int, eps: float, out_dtype,
                            n_buf: int):
    """Manual-DMA version of the fused layer-step kernel: qw/meta arrive
    in ANY memory space and stream through an n_buf-deep VMEM scratch
    ring (see _mdma_prologue) instead of the auto-pipeline."""
    total = n_tiles * d_tiles

    def _kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        u_ref = next(it) if has_silu else None
        ss_ref = next(it) if has_norm else None
        nw_ref = next(it) if has_norm else None
        qw_hbm = next(it)
        meta_hbm = next(it)
        res_ref = next(it) if has_res else None
        o_ref = next(it)
        sso_ref = next(it) if emit_ss else None
        acc_ref = next(it)
        qw_buf = next(it)
        meta_buf = next(it)
        sem = next(it)

        j = pl.program_id(0)  # n-tile (outer)
        i = pl.program_id(1)  # d-tile (inner)
        k = j * d_tiles + i
        qw_ref, meta_ref = _mdma_prologue(
            qw_hbm, meta_hbm, qw_buf, meta_buf, sem, k, chunks=chunks,
            tile_d=tile_d, d_tiles=d_tiles, total=total, n_buf=n_buf)
        sl = pl.ds(i * tile_d, tile_d)

        @pl.when(j == 0)
        def _():
            acc_ref[:, sl] = jnp.zeros((acc_ref.shape[0], tile_d),
                                       jnp.float32)

        acc_ref[:, sl] = _accumulate_glue(
            x_ref, u_ref, ss_ref, nw_ref, qw_ref, meta_ref,
            acc_ref[:, sl], chunks, has_norm=has_norm, has_silu=has_silu)

        @pl.when((j == n_tiles - 1) & (i == d_tiles - 1))
        def _():
            val = acc_ref[:]
            if has_res:
                val = val + res_ref[:].astype(jnp.float32)
            out = val.astype(out_dtype)
            o_ref[:] = out
            if emit_ss:
                of = out.astype(jnp.float32)
                ssq = jnp.sum(of * of, axis=1, keepdims=True)
                sso_ref[:] = jax.lax.rsqrt(ssq / n_real + eps)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("emit_ss_eps", "out_dtype", "n_real",
                              "interpret", "manual_dma"))
def _int4_matmul_fused_2d(x2, u2, ss, nw, qw, meta, res, *, emit_ss_eps,
                          out_dtype, n_real, interpret=False,
                          manual_dma=0):
    m, n_pad = x2.shape
    rows, d_pad = qw.shape
    n_chunks = n_pad // PLANAR_BLOCK
    tile_d, chunks = _pick_tiling(n_chunks, d_pad)
    n_tiles = n_chunks // chunks
    d_tiles = d_pad // tile_d
    emit_ss = emit_ss_eps is not None

    xspec = pl.BlockSpec((m, chunks * PLANAR_BLOCK), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda j, i: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    if manual_dma and chunks % 2 != 0:
        manual_dma = 0  # meta slice needs bf16's 16-row sublane granule

    in_specs, args = [xspec], [x2]
    if u2 is not None:
        in_specs.append(xspec)
        args.append(u2)
    if ss is not None:
        in_specs.append(full((m, 1)))
        args.append(ss)
        in_specs.append(pl.BlockSpec((1, chunks * PLANAR_BLOCK),
                                     lambda j, i: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(nw)
    if manual_dma:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
    else:
        in_specs += [
            pl.BlockSpec((chunks * 64, tile_d), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks * 8, tile_d), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ]
    args += [qw, meta]
    if res is not None:
        in_specs.append(full((m, d_pad)))
        args.append(res)

    out_shape = [jax.ShapeDtypeStruct((m, d_pad), out_dtype)]
    out_specs = [full((m, d_pad))]
    if emit_ss:
        out_shape.append(jax.ShapeDtypeStruct((m, 1), jnp.float32))
        out_specs.append(full((m, 1)))

    cost = pl.CostEstimate(
        flops=2 * m * n_pad * d_pad,
        bytes_accessed=(rows * d_pad * 4 + meta.size * 2 + m * n_pad * 2
                        + m * d_pad * 4),
        transcendentals=m * n_pad if u2 is not None else 0,
    )
    kw = dict(has_norm=ss is not None, has_silu=u2 is not None,
              has_res=res is not None, emit_ss=emit_ss, n_real=n_real,
              eps=emit_ss_eps if emit_ss else 0.0, out_dtype=out_dtype)
    scratch = [pltpu.VMEM((m, d_pad), jnp.float32)]
    if manual_dma:
        kernel = _make_kernel_fused_mdma(chunks, tile_d, n_tiles, d_tiles,
                                         n_buf=manual_dma, **kw)
        scratch += [
            pltpu.VMEM((manual_dma, chunks * 64, tile_d), jnp.uint32),
            pltpu.VMEM((manual_dma, chunks * 8, tile_d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((manual_dma, 2)),
        ]
    else:
        kernel = _make_kernel_fused(chunks, tile_d, n_tiles, d_tiles, **kw)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, d_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
    return (outs[0], outs[1]) if emit_ss else (outs[0], None)


def fused_supported(qt: QTensorTPU, m: int) -> bool:
    """The fused variant needs the d-inner (full-output-row-resident)
    schedule; larger m falls back to the unfused composite."""
    return m * qt.d_pad * 4 <= _DINNER_OUT_BYTES


def int4_matmul_fused(x: jax.Array, qt: QTensorTPU, *,
                      prescale=None, silu_u=None, residual=None,
                      emit_ss_eps=None, out_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """Fused layer-step matmul (see module comment above).

    x: (..., n_in); prescale: (ss (..., 1) f32, norm_w (n_in,) f32);
    silu_u: (..., n_in) up-projection values (x is then the gate);
    residual: (..., n_out) added to the output; emit_ss_eps: float ->
    also return ss' = rsqrt(mean(out^2) + eps) of shape (..., 1).
    Returns (out, ss') with ss' None unless requested.
    """
    lead = x.shape[:-1]
    n_in = x.shape[-1]
    assert n_in == qt.n_in, (n_in, qt.n_in)
    assert prescale is None or silu_u is None
    m = 1
    for s in lead:
        m *= s
    assert fused_supported(qt, m)
    pad_n = qt.n_pad - n_in

    def prep(a):
        a2 = a.reshape(m, n_in).astype(jnp.bfloat16)
        return jnp.pad(a2, ((0, 0), (0, pad_n))) if pad_n else a2

    x2 = prep(x)
    u2 = prep(silu_u) if silu_u is not None else None
    ss = nw = None
    if prescale is not None:
        ss, norm_w = prescale
        ss = ss.reshape(m, 1).astype(jnp.float32)
        nw = norm_w.reshape(1, n_in).astype(jnp.float32)
        if pad_n:
            nw = jnp.pad(nw, ((0, 0), (0, pad_n)))
    res = None
    if residual is not None:
        assert qt.d_pad == qt.n_out, "residual needs an unpadded n_out"
        res = residual.reshape(m, qt.n_out)
    if emit_ss_eps is not None:
        assert qt.d_pad == qt.n_out, "ss epilogue needs an unpadded n_out"

    out, ss_out = _int4_matmul_fused_2d(
        x2, u2, ss, nw, qt.qw, qt.meta, res, emit_ss_eps=emit_ss_eps,
        out_dtype=jnp.dtype(out_dtype), n_real=qt.n_out,
        interpret=interpret,
        manual_dma=_mdma_n_buf(qt.n_pad // PLANAR_BLOCK, qt.d_pad))
    if qt.d_pad != qt.n_out:
        out = out[:, : qt.n_out]
    out = out.reshape(*lead, qt.n_out)
    if ss_out is not None:
        ss_out = ss_out.reshape(*lead, 1)
    return out, ss_out
