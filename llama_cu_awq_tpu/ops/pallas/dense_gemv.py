"""Dense bf16 matvec/matmul Pallas kernel for the lm_head / classifier.

The TPU-native analog of the reference's fp16 GEMV (mat_vec_kernel,
gpu_kernels.h:109-139), which exists because the lm_head is the one
unquantized weight on the per-token critical path (262 MB at 7B — ~7% of
the token's HBM budget). XLA's generic batch-1 matmul on v5e measures at
~300 GB/s; this kernel streams the weight rows through VMEM in large
row-tiles with one MXU dot_general per tile and reaches near HBM
speed-of-light.

out[m, v] = sum_d x[m, d] * w[v, d]   (w row-major (vocab, dim), i.e.
the checkpoint's wcls layout, llama2_q4.cu:181).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target ~5 MB weight tiles: big enough to stream at full bandwidth,
# small enough that the double-buffered pipeline stays inside the
# compiler's 16 MB scoped-VMEM budget alongside the x/out blocks
_TILE_BYTES = int(__import__("os").environ.get("LLAMA_GEMV_TILE_MB", 5)) << 20


def _kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel_int8(x_ref, w_ref, s_ref, o_ref):
    """int8 rows dequantized on the fly: the in-kernel bf16 convert is
    VPU work fully hidden behind the (halved) weight stream; the per-row
    scale (fed lane-major as (1, v)) lands as an output-column multiply
    (quant/int8.py)."""
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:]


def _make_kernel_mdma(tile_v: int, n_tiles: int, n_buf: int,
                      has_scale: bool):
    """Manual-DMA variant: w arrives in ANY memory space and streams
    through an n_buf-deep VMEM scratch ring (same recipe as
    int4_matmul._mdma_prologue) — MSA has nothing to stage around the
    kernel, and the classifier's weight tiles (the scoped pool's
    largest auto-pipeline consumer at 640 rows x dim) stop competing
    with the int4 kernels' staging budget."""

    def _kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        w_hbm = next(it)
        s_ref = next(it) if has_scale else None
        o_ref = next(it)
        w_buf = next(it)
        sem = next(it)
        k = pl.program_id(0)

        def dma(t, slot):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(t * tile_v, tile_v), :],
                w_buf.at[slot], sem.at[slot])

        @pl.when(k == 0)
        def _():
            for t in range(min(n_buf, n_tiles)):
                dma(t, t).start()

        @pl.when((k > 0) & (k + n_buf - 1 < n_tiles))
        def _():
            t = k + n_buf - 1
            dma(t, t % n_buf).start()

        slot = k % n_buf
        dma(k, slot).wait()
        w_ref = w_buf.at[slot]
        if has_scale:
            acc = jax.lax.dot_general(
                x_ref[:], w_ref[:].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[:] = acc * s_ref[:]
        else:
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    return _kernel


def _gemv_mdma_n_buf() -> int:
    """0 = auto-pipeline; N>=2 = manual-DMA ring (LLAMA_GEMV_MANUAL_DMA,
    falling back to LLAMA_INT4_MANUAL_DMA so one env var flips both
    kernel families in an A/B). TPU-only, like int4's _mdma_n_buf: the
    CPU interpreters hang on multi-step-grid DMA rings."""
    import os

    v = os.environ.get("LLAMA_GEMV_MANUAL_DMA")
    if v is None:
        # inherited ring depth capped at 2: gemv tiles are ~5 MB each
        # (vs the int4 kernels' ~1-2 MB blocks), so a deep ring would
        # blow the scoped-VMEM pool
        v = os.environ.get("LLAMA_INT4_MANUAL_DMA", "0")
        if ":" in v:
            v = "0"  # exact-shape form is int4-kernel-only; gemv opts out
        n = 2 if int(v or 0) else 0
    else:
        v = int(v or 0)
        n = max(v, 2) if v else 0
    if not n:
        return 0
    from llama_cu_awq_tpu.ops.linear import _on_tpu

    return n if _on_tpu() else 0


def _pick_tile(v: int, d: int, itemsize: int) -> int | None:
    """Largest row count that divides v, is a multiple of 128 (it is the
    LANE dim of the output block), and fits the tile budget; None if v
    is awkward (llama vocab 32000 -> 1280)."""
    budget = max(_TILE_BYTES // (d * itemsize), 128)
    best = None
    for t in range(128, min(v, budget) + 1, 128):
        if v % t == 0:
            best = t
    return best


def supports(x: jax.Array, w: jax.Array, max_m: int = 256) -> bool:
    v, d = w.shape
    m = 1
    for s in x.shape[:-1]:
        m *= s
    return (w.dtype in (jnp.bfloat16, jnp.int8) and x.shape[-1] == d
            and d % 128 == 0 and m <= max_m
            and _pick_tile(v, d, w.dtype.itemsize) is not None)


@functools.partial(jax.jit, static_argnames=("interpret", "manual_dma"))
def _gemv_2d(x2: jax.Array, w: jax.Array, scale=None, *,
             interpret=False, manual_dma=0) -> jax.Array:
    m, d = x2.shape
    v, _ = w.shape
    tile_v = _pick_tile(v, d, w.dtype.itemsize)
    n_tiles = v // tile_v
    cost = pl.CostEstimate(
        flops=2 * m * d * v,
        bytes_accessed=v * d * w.dtype.itemsize + m * d * 2 + m * v * 4,
        transcendentals=0)
    if manual_dma:
        in_specs = [
            pl.BlockSpec((m, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = [x2, w]
        if scale is not None:
            in_specs.append(pl.BlockSpec((1, tile_v), lambda i: (0, i),
                                         memory_space=pltpu.VMEM))
            args.append(scale)
        return pl.pallas_call(
            _make_kernel_mdma(tile_v, n_tiles, manual_dma,
                              has_scale=scale is not None),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m, tile_v), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, v), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((manual_dma, tile_v, d), w.dtype),
                pltpu.SemaphoreType.DMA((manual_dma,)),
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*args)
    in_specs = [
        pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, w]
    if scale is not None:  # (1, v) f32, lane-major
        in_specs.append(pl.BlockSpec((1, tile_v), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(scale)
    return pl.pallas_call(
        _kernel if scale is None else _kernel_int8,
        grid=(v // tile_v,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, tile_v), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, v), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


def dense_gemv(x: jax.Array, w: jax.Array, scale=None, *,
               interpret: bool = False) -> jax.Array:
    """x: (..., d) -> (..., v) f32 logits; w: (v, d) row-major, bf16 or
    int8 (with scale: (v, 1) f32 per-row dequant factors)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    m = 1
    for s in lead:
        m *= s
    out = _gemv_2d(x.reshape(m, d).astype(jnp.bfloat16), w, scale,
                   interpret=interpret, manual_dma=_gemv_mdma_n_buf())
    return out.reshape(*lead, w.shape[0])
