"""Multi-stage w4-g128 chain kernel: o-proj + gate/up + down (+ the
NEXT layer's qkv) in ONE Pallas launch.

After the fused attention-step kernel, a decoder layer still runs
three back-to-back matmul kernels between attentions (wo -> gate_up ->
down), and the next layer's qkv kernel follows immediately after. Each
kernel boundary costs a DMA pipeline warmup and a slot of partially-
exposed XLA weight staging (PERFORMANCE.md measures ~0.7 ms of exposed
MSA staging across ~100 per-step boundaries at 7B batch-1). This
kernel runs the whole inter-attention chain as ONE sequential grid, so
~100 MB of layer weights stream through a single uninterrupted
double-buffered pipeline:

  stage 0 (wo):      acc = attn @ W_o ; x1 = acc + x_res (residual)
                     ss1 = rsqrt(mean(x1^2) + eps)
  stage 1 (gate_up): acc = (x1 * ss1 * ffn_norm) @ W_gate_up
  stage 2 (down):    acc = (silu(gate) * up) @ W_down ; x2 = acc + x1
                     ss2 = rsqrt(mean(x2^2) + eps)
  stage 3 (qkv, optional): acc = (x2 * ss2 * attn_norm') @ W_qkv'
                     — the NEXT layer's projection row, ready for the
                     attention-step kernel

identical math to the qmatmul_fused calls it replaces
(models/llama._post_attention + the loop-top qkv); the reference
analog is its accum-flag matmul + ffn_matvec_silu_kernel pair
(gpu_kernels.h:213-275) — here additionally welded into one launch,
which CUDA cannot express but a sequential Pallas grid can. With
attn_impl='fused_step' a decoder layer becomes TWO kernel launches.

Grid mechanics: a 1-D grid of sum(n_tiles_s * d_tiles_s) steps; each
weight tensor's index map clamps the stage-local step into its own
range, so blocks outside a tensor's stage pin to a boundary block and
Mosaic never refetches them (the next stage's first block is therefore
prefetched DURING the previous stage — the warmup bubble disappears).
Stage-internal activations live in VMEM scratch (stage 3 reads the x2
and ss2 OUTPUT refs, which stay VMEM-resident until the grid ends);
per-j input chunks are copied from the full-row scratch by a
statically unrolled `pl.when(j == jv)` ladder (n_tiles <= ~11),
keeping every lane slice static for Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_cu_awq_tpu.quant.packing import PLANAR_BLOCK
from llama_cu_awq_tpu.quant.qtensor import QTensorTPU
from llama_cu_awq_tpu.ops.pallas.int4_matmul import (_MASK, _BF16_BIAS,
                                                     _pick_tiling)


def _stage_plan(qt: QTensorTPU):
    n_chunks = qt.n_pad // PLANAR_BLOCK
    tile_d, chunks = _pick_tiling(n_chunks, qt.d_pad)
    n_tiles = n_chunks // chunks
    d_tiles = qt.d_pad // tile_d
    return dict(tile_d=tile_d, chunks=chunks, n_tiles=n_tiles,
                d_tiles=d_tiles, steps=n_tiles * d_tiles,
                n_pad=qt.n_pad, d_pad=qt.d_pad)


def _make_chain_kernel(m, plans, offs, dim, hidden, gu_pad, eps,
                       out_dtype, has_qkv):
    p0, p1, p2 = plans[:3]
    o1, o2, o3 = offs[1], offs[2], offs[3]
    total = offs[-1]

    def _kernel(*refs):
        it = iter(refs)
        attn_ref = next(it)
        res_ref = next(it)
        nw_ref = next(it)
        qw0, mt0 = next(it), next(it)
        qw1, mt1 = next(it), next(it)
        qw2, mt2 = next(it), next(it)
        if has_qkv:
            nw2_ref = next(it)
            qw3, mt3 = next(it), next(it)
        xo_ref = next(it)
        sso_ref = next(it)
        qkv_ref = next(it) if has_qkv else None
        acc_ref = next(it)
        x1_ref = next(it)
        gu_ref = next(it)
        ss1_ref = next(it)
        xcur_ref = next(it)

        gg = pl.program_id(0)

        def accum_block(x_get, qw_ref, meta_ref, sl, chunks):
            """x_get(g) -> (m, 128) bf16 chunk group g of this block."""
            acc = acc_ref[:, sl]
            for t in range(chunks):
                words = qw_ref[t * 64:(t + 1) * 64, :]
                for pp in range(4):
                    g = t * 4 + pp
                    v = ((words >> (4 * pp)) & _MASK) | _BF16_BIAS
                    q = pltpu.bitcast(v, jnp.bfloat16)
                    xi = x_get(g)
                    part = jnp.dot(xi, q,
                                   preferred_element_type=jnp.float32)
                    sx = jnp.sum(xi.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    s = meta_ref[2 * g, :].astype(jnp.float32)
                    z128 = meta_ref[2 * g + 1, :].astype(jnp.float32)
                    acc = acc + (part - sx * z128[None, :]) * s[None, :]
            acc_ref[:, sl] = acc

        def prescale_fill(plan, j, x_src, ss_src, nw_src):
            """xcur <- bf16(x * ss * norm_w) for this j-block; columns
            past `dim` are even-chunk planar padding -> zeros."""
            cc = plan["chunks"] * PLANAR_BLOCK
            for jv in range(plan["n_tiles"]):
                @pl.when(j == jv)
                def _(jv=jv):
                    for g in range(plan["chunks"] * 4):
                        col = jv * cc + g * 128
                        dst = pl.ds(g * 128, 128)
                        if col >= dim:
                            xcur_ref[:, dst] = jnp.zeros(
                                (m, 128), jnp.bfloat16)
                        else:
                            xs = x_src[:, col:col + 128]
                            xcur_ref[:, dst] = (
                                xs.astype(jnp.float32) * ss_src[:]
                                * nw_src[:, col:col + 128]
                            ).astype(jnp.bfloat16)

        # ---------------- stage 0: wo + residual ----------------
        @pl.when(gg < o1)
        def _():
            j = gg // p0["d_tiles"]
            i = gg % p0["d_tiles"]
            sl = pl.ds(i * p0["tile_d"], p0["tile_d"])

            @pl.when(j == 0)
            def _():
                acc_ref[:, sl] = jnp.zeros((m, p0["tile_d"]), jnp.float32)

            accum_block(lambda g: attn_ref[:, g * 128:(g + 1) * 128]
                        .astype(jnp.bfloat16), qw0, mt0, sl,
                        p0["chunks"])

            @pl.when(gg == o1 - 1)
            def _():
                val = acc_ref[:, :dim] + res_ref[:].astype(jnp.float32)
                x1 = val.astype(out_dtype)
                x1_ref[:] = x1
                of = x1.astype(jnp.float32)
                ssq = jnp.sum(of * of, axis=1, keepdims=True)
                ss1_ref[:] = jax.lax.rsqrt(ssq / dim + eps)

        # ---------------- stage 1: gate_up with rms prescale --------
        @pl.when((gg >= o1) & (gg < o2))
        def _():
            gl = gg - o1
            j = gl // p1["d_tiles"]
            i = gl % p1["d_tiles"]
            sl = pl.ds(i * p1["tile_d"], p1["tile_d"])

            @pl.when(j == 0)
            def _():
                acc_ref[:, sl] = jnp.zeros((m, p1["tile_d"]), jnp.float32)

            @pl.when(i == 0)
            def _():
                prescale_fill(p1, j, x1_ref, ss1_ref, nw_ref)

            accum_block(lambda g: xcur_ref[:, g * 128:(g + 1) * 128],
                        qw1, mt1, sl, p1["chunks"])

            @pl.when(gg == o2 - 1)
            def _():
                # gate/up stay bf16 (parity with the fused kernels'
                # out_dtype handoff)
                gu_ref[:] = acc_ref[:, :gu_pad].astype(jnp.bfloat16)

        # ---------------- stage 2: silu-glued down + residual -------
        @pl.when((gg >= o2) & (gg < o3))
        def _():
            gl = gg - o2
            j = gl // p2["d_tiles"]
            i = gl % p2["d_tiles"]
            sl = pl.ds(i * p2["tile_d"], p2["tile_d"])
            cc = p2["chunks"] * PLANAR_BLOCK

            @pl.when(j == 0)
            def _():
                acc_ref[:, sl] = jnp.zeros((m, p2["tile_d"]), jnp.float32)

            @pl.when(i == 0)
            def _():
                for jv in range(p2["n_tiles"]):
                    @pl.when(j == jv)
                    def _(jv=jv):
                        for g in range(p2["chunks"] * 4):
                            col = jv * cc + g * 128
                            dst = pl.ds(g * 128, 128)
                            if col >= hidden:  # zero-scale pad columns
                                xcur_ref[:, dst] = jnp.zeros(
                                    (m, 128), jnp.bfloat16)
                            else:
                                gf = gu_ref[:, col:col + 128].astype(
                                    jnp.float32)
                                uf = gu_ref[:,
                                            hidden + col:hidden + col
                                            + 128].astype(jnp.float32)
                                xcur_ref[:, dst] = (
                                    gf * jax.nn.sigmoid(gf) * uf
                                ).astype(jnp.bfloat16)

            accum_block(lambda g: xcur_ref[:, g * 128:(g + 1) * 128],
                        qw2, mt2, sl, p2["chunks"])

            @pl.when(gg == o3 - 1)
            def _():
                val = acc_ref[:, :dim] + x1_ref[:].astype(jnp.float32)
                out = val.astype(out_dtype)
                xo_ref[:] = out
                of = out.astype(jnp.float32)
                ssq = jnp.sum(of * of, axis=1, keepdims=True)
                sso_ref[:] = jax.lax.rsqrt(ssq / dim + eps)

        # ------- stage 3 (optional): next layer's qkv projection -----
        if has_qkv:
            p3 = plans[3]

            @pl.when(gg >= o3)
            def _():
                gl = gg - o3
                j = gl // p3["d_tiles"]
                i = gl % p3["d_tiles"]
                sl = pl.ds(i * p3["tile_d"], p3["tile_d"])

                @pl.when(j == 0)
                def _():
                    acc_ref[:, sl] = jnp.zeros((m, p3["tile_d"]),
                                               jnp.float32)

                @pl.when(i == 0)
                def _():
                    prescale_fill(p3, j, xo_ref, sso_ref, nw2_ref)

                accum_block(lambda g: xcur_ref[:, g * 128:(g + 1) * 128],
                            qw3, mt3, sl, p3["chunks"])

                @pl.when(gg == total - 1)
                def _():
                    qkv_ref[:] = acc_ref[:, :p3["d_pad"]].astype(
                        out_dtype)

    return _kernel


def ffn_chain_supported(wo: QTensorTPU, w_gate_up: QTensorTPU,
                        w_down: QTensorTPU, m: int,
                        wqkv_next: QTensorTPU | None = None) -> bool:
    """VMEM feasibility + layout requirements for the chain kernel."""
    tensors = (wo, w_gate_up, w_down) + (
        (wqkv_next,) if wqkv_next is not None else ())
    if not all(isinstance(t, QTensorTPU) for t in tensors):
        return False
    dim, hidden2 = wo.n_out, w_gate_up.n_out
    hidden = hidden2 // 2
    if w_down.n_in != hidden or w_gate_up.n_in != dim:
        return False
    if hidden % 128 or dim % PLANAR_BLOCK:
        return False
    if wqkv_next is not None and wqkv_next.n_in != dim:
        return False
    # full gate_up (+ qkv) output row + acc row resident in VMEM
    rows = w_gate_up.d_pad * 6
    if wqkv_next is not None:
        rows += wqkv_next.d_pad * 6
    return m * rows <= (4 << 20)


def ffn_chain(attn: jax.Array, x_res: jax.Array, ffn_norm: jax.Array,
              wo: QTensorTPU, w_gate_up: QTensorTPU,
              w_down: QTensorTPU, *, eps: float,
              wqkv_next: QTensorTPU | None = None,
              attn_norm_next: jax.Array | None = None,
              out_dtype=jnp.bfloat16, interpret: bool = False):
    """The inter-attention chain of one decoder layer in one kernel.

    attn: (..., dim) attention output; x_res: (..., dim) residual
    stream; ffn_norm: (dim,) rms weight. Returns (x_out (..., dim)
    out_dtype, ss (..., 1) f32[, qkv_next (..., qkv_dim) out_dtype
    when wqkv_next is given]) — identical contract to the
    qmatmul_fused composition it replaces.
    """
    lead = attn.shape[:-1]
    dim = wo.n_out
    hidden = w_gate_up.n_out // 2
    has_qkv = wqkv_next is not None
    m = 1
    for s in lead:
        m *= s
    assert attn.shape[-1] == wo.n_in
    assert x_res.shape[-1] == dim and wo.d_pad == dim, \
        "chain needs an unpadded o-proj output"
    assert w_down.d_pad == w_down.n_out == dim
    assert has_qkv == (attn_norm_next is not None)

    attn2 = attn.reshape(m, wo.n_in).astype(jnp.bfloat16)
    if wo.n_pad != wo.n_in:
        attn2 = jnp.pad(attn2, ((0, 0), (0, wo.n_pad - wo.n_in)))
    res2 = x_res.reshape(m, dim)
    nw = ffn_norm.reshape(1, dim).astype(jnp.float32)

    qts = [wo, w_gate_up, w_down] + ([wqkv_next] if has_qkv else [])
    plans = [_stage_plan(qt) for qt in qts]
    offs = [0]
    for p in plans:
        offs.append(offs[-1] + p["steps"])
    gu_pad = w_gate_up.d_pad

    kernel = _make_chain_kernel(m, plans, offs, dim, hidden, gu_pad,
                                eps, jnp.dtype(out_dtype), has_qkv)

    def stage_map(s):
        p, off = plans[s], offs[s]

        def _map(g):
            gl = jnp.clip(g - off, 0, p["steps"] - 1)
            return (gl // p["d_tiles"], gl % p["d_tiles"])

        return _map

    def attn_map(g):
        p = plans[0]
        gl = jnp.clip(g, 0, p["steps"] - 1)
        return (0, gl // p["d_tiles"])

    full_row = lambda g: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((m, plans[0]["chunks"] * PLANAR_BLOCK), attn_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, dim), full_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dim), full_row, memory_space=pltpu.VMEM),
    ]
    args = [attn2, res2, nw]

    def add_stage(s, qt):
        p = plans[s]
        in_specs.extend([
            pl.BlockSpec((p["chunks"] * 64, p["tile_d"]), stage_map(s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p["chunks"] * 8, p["tile_d"]), stage_map(s),
                         memory_space=pltpu.VMEM),
        ])
        args.extend([qt.qw, qt.meta])

    for s in range(3):
        add_stage(s, qts[s])
    if has_qkv:
        in_specs.append(pl.BlockSpec((1, dim), full_row,
                                     memory_space=pltpu.VMEM))
        args.append(attn_norm_next.reshape(1, dim).astype(jnp.float32))
        add_stage(3, wqkv_next)

    out_specs = [
        pl.BlockSpec((m, dim), full_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((m, 1), full_row, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, dim), jnp.dtype(out_dtype)),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    ]
    if has_qkv:
        qkv_pad = plans[3]["d_pad"]
        out_specs.append(pl.BlockSpec((m, qkv_pad), full_row,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m, qkv_pad),
                                              jnp.dtype(out_dtype)))

    acc_cols = max(p["d_pad"] for p in plans)
    xcur_cols = max(p["chunks"] * PLANAR_BLOCK for p in plans[1:])
    bytes_total = sum(qt.qw.size * 4 + qt.meta.size * 2 for qt in qts) \
        + m * (wo.n_pad + 3 * dim) * 4
    cost = pl.CostEstimate(
        flops=2 * m * sum(p["n_pad"] * p["d_pad"] for p in plans),
        bytes_accessed=bytes_total,
        transcendentals=m * hidden)

    outs = pl.pallas_call(
        kernel,
        grid=(offs[-1],),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((m, acc_cols), jnp.float32),      # acc
            pltpu.VMEM((m, dim), jnp.dtype(out_dtype)),  # x1
            pltpu.VMEM((m, gu_pad), jnp.bfloat16),       # gate_up row
            pltpu.VMEM((m, 1), jnp.float32),             # ss1
            pltpu.VMEM((m, xcur_cols), jnp.bfloat16),    # current x chunk
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    x_out = outs[0].reshape(*lead, dim)
    ss = outs[1].reshape(*lead, 1)
    if not has_qkv:
        return x_out, ss
    qkv = outs[2]
    if wqkv_next.d_pad != wqkv_next.n_out:
        qkv = qkv[:, : wqkv_next.n_out]
    return x_out, ss, qkv.reshape(*lead, wqkv_next.n_out)
