"""down-proj + NEXT layer's qkv in ONE Pallas launch (2-stage chain).

The round-2 XProf attribution showed the single biggest exposed cost of
batch-1 decode is MSA staging around the qkv kernel (~0.7 ms/step at 7B
— the 6.3 MB half-tiles of the FIRST matmul after attention have no
predecessor kernel to overlap with; at 13B the same exposure showed as
qkv measuring 54.9 us vs its 37.5 us HBM bound). The retired 4-stage
chain (tools/experiments/int4_chain.py) attacked ALL the boundaries and
lost end-to-end — its o/gate_up stages are better served standalone —
so this is the MINIMAL version (VERDICT r4 item 5): only the
down-proj -> next-qkv boundary is welded, chosen because

  * down ends the layer and qkv opens the next: this is the boundary
    where the measured exposure lives,
  * the pair shares no activation traffic (qkv's input IS down's
    output, so the x row never leaves VMEM between the stages), and
  * o-proj/gate_up keep their measured-winning standalone kernels.

Stage D (= int4_matmul_fused w_down semantics, gpu_kernels.h:259-275):
    h   = silu(g) * u                        (in-kernel SwiGLU prologue)
    acc = h @ W_down                         (pair-planar dequant dots)
    x2  = (acc + x1).astype(out_dtype); ss2 = rsqrt(mean(x2^2) + eps)
Stage Q (= the next layer's fused-qkv prescale matmul):
    qkv = (x2 * ss2 * attn_norm') @ W_qkv'   (reference: per-layer qkv
                                              matvec, llama2_q4.cu:301)

Grid mechanics are the chain kernel's, reduced to two stages: one
arbitrary-order 1-D grid of totalD + totalQ steps; each weight
tensor's index map CLAMPS the stage-local step into its own range, so
W_qkv's first block prefetches DURING the down stage (no warmup
bubble at the boundary) and the down blocks pin during stage Q (no
refetch). x2/ss2 live in the constant-index-map output refs, which
stay VMEM-resident for the whole grid — stage Q reads them directly.

Numerics are bit-compatible with the two standalone kernels it
replaces: stage D casts acc+res to out_dtype BEFORE the ss2 reduction
(same staging as _make_kernel_fused's epilogue), and stage Q reads the
same bf16-rounded x2 the standalone qkv kernel would load from HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_cu_awq_tpu.quant.packing import PLANAR_BLOCK
from llama_cu_awq_tpu.quant.qtensor import QTensorTPU
from llama_cu_awq_tpu.ops.pallas.int4_matmul import (
    _MASK,
    _BF16_BIAS,
    _accumulate_glue,
    _pick_tiling,
)


def _make_kernel(m, chunksD, tileD, ntD, dtD, chunksQ, tileQ, ntQ, dtQ,
                 n_real, eps, out_dtype):
    totalD = ntD * dtD
    totalQ = ntQ * dtQ

    def _kernel(g_ref, u_ref, res_ref, nw_ref, qwD_ref, mtD_ref,
                qwQ_ref, mtQ_ref, xo_ref, sso_ref, qo_ref, accD_ref):
        k = pl.program_id(0)

        # ---------------- stage D: silu-glued down + residual --------
        @pl.when(k < totalD)
        def _():
            jd = k // dtD
            idx = k % dtD
            sl = pl.ds(idx * tileD, tileD)

            @pl.when(jd == 0)
            def _():
                accD_ref[:, sl] = jnp.zeros((m, tileD), jnp.float32)

            accD_ref[:, sl] = _accumulate_glue(
                g_ref, u_ref, None, None, qwD_ref, mtD_ref,
                accD_ref[:, sl], chunksD, has_norm=False, has_silu=True)

        # stage-D epilogue: same staging as _make_kernel_fused — cast
        # to out_dtype BEFORE the rms reduction
        @pl.when(k == totalD - 1)
        def _():
            out = (accD_ref[:] + res_ref[:].astype(jnp.float32)
                   ).astype(out_dtype)
            xo_ref[:] = out
            of = out.astype(jnp.float32)
            ssq = jnp.sum(of * of, axis=1, keepdims=True)
            sso_ref[:] = jax.lax.rsqrt(ssq / n_real + eps)

        # ---------------- stage Q: next layer's qkv with prescale ----
        @pl.when(k >= totalD)
        def _():
            kq = k - totalD
            jq = kq // dtQ
            iq = kq % dtQ
            sl = pl.ds(iq * tileQ, tileQ)

            @pl.when(jq == 0)
            def _():
                qo_ref[:, sl] = jnp.zeros((m, tileQ), jnp.float32)

            acc = qo_ref[:, sl]
            ss = sso_ref[:]
            for t in range(chunksQ):
                words = qwQ_ref[t * 64:(t + 1) * 64, :]
                for p in range(4):
                    g = t * 4 + p
                    gsl = pl.ds((jq * chunksQ + t) * PLANAR_BLOCK
                                + p * 128, 128)
                    v = ((words >> (4 * p)) & _MASK) | _BF16_BIAS
                    q = pltpu.bitcast(v, jnp.bfloat16)
                    xi = (xo_ref[:, gsl].astype(jnp.float32) * ss
                          * nw_ref[:, gsl]).astype(jnp.bfloat16)
                    part = jnp.dot(xi, q,
                                   preferred_element_type=jnp.float32)
                    sx = jnp.sum(xi.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    s = mtQ_ref[2 * g, :].astype(jnp.float32)
                    z128 = mtQ_ref[2 * g + 1, :].astype(jnp.float32)
                    acc = acc + (part - sx * z128[None, :]) * s[None, :]
            qo_ref[:, sl] = acc

    return _kernel


def supported(w_down: QTensorTPU, wqkv: QTensorTPU, m: int) -> bool:
    """Gate: qkv must read exactly the row down emits (padded widths
    equal), the full x2 row + both output rows must be VMEM-modest,
    and the meta sublane granule must hold for both stages."""
    if w_down.d_pad != wqkv.n_pad:
        return False
    # (_pick_tiling already guarantees the bf16 meta sublane rule:
    # chunks even, or the block covers the whole chunk axis)
    # rows resident for the whole grid: x2 (bf16) + qkv acc (f32) +
    # down acc (f32) + residual (bf16)
    vmem = m * (w_down.d_pad * (2 + 4 + 2) + wqkv.d_pad * 4)
    return vmem <= (6 << 20)


@functools.partial(jax.jit, static_argnames=("eps", "n_real",
                                             "out_dtype", "interpret"))
def _down_qkv_2d(g2, u2, res, nw, qwD, mtD, qwQ, mtQ, *, eps, n_real,
                 out_dtype, interpret=False):
    m, n_padD = g2.shape
    d_padD = qwD.shape[1]
    n_padQ, d_padQ = nw.shape[1], qwQ.shape[1]
    n_chunksD = n_padD // PLANAR_BLOCK
    tileD, chunksD = _pick_tiling(n_chunksD, d_padD)
    ntD, dtD = n_chunksD // chunksD, d_padD // tileD
    n_chunksQ = n_padQ // PLANAR_BLOCK
    tileQ, chunksQ = _pick_tiling(n_chunksQ, d_padQ)
    ntQ, dtQ = n_chunksQ // chunksQ, d_padQ // tileQ
    totalD, totalQ = ntD * dtD, ntQ * dtQ

    def dmap(k):
        kd = jnp.minimum(k, totalD - 1)
        return (kd // dtD, kd % dtD)

    def qmap(k):
        kq = jnp.clip(k - totalD, 0, totalQ - 1)
        return (kq // dtQ, kq % dtQ)

    xspec = pl.BlockSpec((m, chunksD * PLANAR_BLOCK),
                         lambda k: (0, dmap(k)[0]),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda k: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    in_specs = [
        xspec, xspec,                      # g, u
        full((m, d_padD)),                 # residual
        full((1, n_padQ)),                 # attn_norm'
        pl.BlockSpec((chunksD * 64, tileD), lambda k: dmap(k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunksD * 8, tileD), lambda k: dmap(k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunksQ * 64, tileQ), lambda k: qmap(k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunksQ * 8, tileQ), lambda k: qmap(k),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, d_padD), out_dtype),   # x2
        jax.ShapeDtypeStruct((m, 1), jnp.float32),      # ss2
        jax.ShapeDtypeStruct((m, d_padQ), jnp.float32),  # qkv
    ]
    out_specs = [full((m, d_padD)), full((m, 1)), full((m, d_padQ))]
    cost = pl.CostEstimate(
        flops=2 * m * (n_padD * d_padD + n_padQ * d_padQ),
        bytes_accessed=(qwD.size * 4 + mtD.size * 2 + qwQ.size * 4
                        + mtQ.size * 2 + 2 * m * n_padD * 2
                        + m * (d_padD + d_padQ) * 4),
        transcendentals=m * n_padD,
    )
    kernel = _make_kernel(m, chunksD, tileD, ntD, dtD, chunksQ, tileQ,
                          ntQ, dtQ, n_real, eps, out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(totalD + totalQ,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((m, d_padD), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(g2, u2, res, nw, qwD, mtD, qwQ, mtQ)


def down_qkv_fused(g: jax.Array, u: jax.Array, residual: jax.Array,
                   w_down: QTensorTPU, wqkv_next: QTensorTPU,
                   attn_norm_next: jax.Array, *, eps: float,
                   out_dtype=jnp.bfloat16, interpret: bool = False):
    """x2, ss2, qkv_next = chained down-proj + next-layer qkv.

    g, u: (..., hidden) SwiGLU operands (gate_up output halves);
    residual: (..., dim); attn_norm_next: (dim,) f32.
    Returns x2 (..., dim) out_dtype, ss2 (..., 1) f32,
    qkv_next (..., wqkv_next.n_out) f32.
    """
    lead = g.shape[:-1]
    hid = g.shape[-1]
    dim = residual.shape[-1]
    assert hid == w_down.n_in and dim == wqkv_next.n_in
    m = 1
    for s in lead:
        m *= s

    def prep(a, n_pad):
        a2 = a.reshape(m, a.shape[-1]).astype(jnp.bfloat16)
        if a2.shape[1] != n_pad:
            a2 = jnp.pad(a2, ((0, 0), (0, n_pad - a2.shape[1])))
        return a2

    g2 = prep(g, w_down.n_pad)
    u2 = prep(u, w_down.n_pad)
    res = prep(residual, w_down.d_pad)
    nw = attn_norm_next.astype(jnp.float32)[None, :]
    if nw.shape[1] != wqkv_next.n_pad:
        nw = jnp.pad(nw, ((0, 0), (0, wqkv_next.n_pad - nw.shape[1])))
    x2, ss2, qkv = _down_qkv_2d(
        g2, u2, res, nw, w_down.qw, w_down.meta, wqkv_next.qw,
        wqkv_next.meta, eps=eps, n_real=dim, out_dtype=out_dtype,
        interpret=interpret)
    x2 = x2[:, :dim].reshape(*lead, dim)
    qkv = qkv[:, :wqkv_next.n_out].reshape(*lead, wqkv_next.n_out)
    return x2, ss2.reshape(*lead, 1), qkv
