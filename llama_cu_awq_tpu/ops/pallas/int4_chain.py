"""Multi-stage w4-g128 chain kernel: o-proj + gate/up + down in ONE
Pallas launch.

After the fused attention-step kernel, a decoder layer still runs
three back-to-back matmul kernels between attentions (wo -> gate_up ->
down). Each kernel boundary costs a DMA pipeline warmup and a slot of
partially-exposed XLA weight staging (PERFORMANCE.md measures ~0.7 ms
of exposed MSA staging across ~100 per-step boundaries at 7B batch-1).
This kernel runs the whole post-attention chain as ONE sequential grid,
so a layer's ~75 MB FFN+o-proj weight stream flows through a single
uninterrupted double-buffered pipeline:

  stage 0 (wo):      acc = attn @ W_o ; x1 = acc + x_res (residual)
                     ss1 = rsqrt(mean(x1^2) + eps)
  stage 1 (gate_up): acc = (x1 * ss1 * ffn_norm) @ W_gate_up
  stage 2 (down):    acc = (silu(gate) * up) @ W_down ; x2 = acc + x1
                     ss2 = rsqrt(mean(x2^2) + eps)

identical math to the three qmatmul_fused calls it replaces
(models/llama._post_attention); the reference analog is its accum-flag
matmul + ffn_matvec_silu_kernel pair (gpu_kernels.h:213-275) — here
additionally welded into one launch, which CUDA cannot express but a
sequential Pallas grid can.

Grid mechanics: a 1-D grid of sum(n_tiles_s * d_tiles_s) steps; each
weight tensor's index map clamps the stage-local step into its own
range, so blocks outside a tensor's stage pin to a boundary block and
Mosaic never refetches them (the next stage's first block is therefore
prefetched DURING the previous stage — the warmup bubble disappears).
Stage-internal activations live in VMEM scratch; per-j input chunks
are copied from the full-row scratch by a statically unrolled
`pl.when(j == jv)` ladder (n_tiles is <= ~11), keeping every lane
slice static for Mosaic.
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
                       out_dtype):
    """plans: [wo, gu, down] stage plans; offs: stage start steps."""
    p0, p1, p2 = plans
    o1, o2 = offs[1], offs[2]
    total = offs[3]

    def _accum_block(x_get, qw_ref, meta_ref, acc_ref, sl, tile_d,
                     chunks):
        """x_get(g) -> (m, 128) bf16 chunk group g of this j-block."""
        acc = acc_ref[:, sl]
        for t in range(chunks):
            words = qw_ref[t * 64:(t + 1) * 64, :]
            for pp in range(4):
                g = t * 4 + pp
                v = ((words >> (4 * pp)) & _MASK) | _BF16_BIAS
                q = pltpu.bitcast(v, jnp.bfloat16)
                xi = x_get(g)
                part = jnp.dot(xi, q, preferred_element_type=jnp.float32)
                sx = jnp.sum(xi.astype(jnp.float32), axis=1,
                             keepdims=True)
                s = meta_ref[2 * g, :].astype(jnp.float32)
                z128 = meta_ref[2 * g + 1, :].astype(jnp.float32)
                acc = acc + (part - sx * z128[None, :]) * s[None, :]
        acc_ref[:, sl] = acc

    def _kernel(attn_ref, res_ref, nw_ref, qw0, mt0, qw1, mt1, qw2, mt2,
                xo_ref, sso_ref, acc_ref, x1_ref, gu_ref, ss1_ref,
                xcur_ref):
        gg = pl.program_id(0)

        # ---------------- stage 0: wo + residual ----------------
        @pl.when(gg < o1)
        def _():
            j = gg // p0["d_tiles"]
            i = gg % p0["d_tiles"]
            sl = pl.ds(i * p0["tile_d"], p0["tile_d"])

            @pl.when(j == 0)
            def _():
                acc_ref[:, sl] = jnp.zeros((m, p0["tile_d"]), jnp.float32)

            _accum_block(lambda g: attn_ref[:, g * 128:(g + 1) * 128]
                         .astype(jnp.bfloat16),
                         qw0, mt0, acc_ref, sl, p0["tile_d"],
                         p0["chunks"])

            @pl.when(gg == o1 - 1)
            def _():
                val = (acc_ref[:, :dim]
                       + res_ref[:].astype(jnp.float32))
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
            cc = p1["chunks"] * PLANAR_BLOCK

            @pl.when(j == 0)
            def _():
                acc_ref[:, sl] = jnp.zeros((m, p1["tile_d"]), jnp.float32)

            @pl.when(i == 0)
            def _():
                for jv in range(p1["n_tiles"]):
                    @pl.when(j == jv)
                    def _(jv=jv):
                        for g in range(p1["chunks"] * 4):
                            col = jv * cc + g * 128
                            dst = pl.ds(g * 128, 128)
                            if col >= dim:  # even-chunk planar pad
                                xcur_ref[:, dst] = jnp.zeros(
                                    (m, 128), jnp.bfloat16)
                            else:
                                xs = x1_ref[:, col:col + 128]
                                xcur_ref[:, dst] = (
                                    xs.astype(jnp.float32) * ss1_ref[:]
                                    * nw_ref[:, col:col + 128]
                                ).astype(jnp.bfloat16)

            _accum_block(lambda g: xcur_ref[:, g * 128:(g + 1) * 128],
                         qw1, mt1, acc_ref, sl, p1["tile_d"],
                         p1["chunks"])

            @pl.when(gg == o2 - 1)
            def _():
                # gate/up stay bf16 (parity with the fused kernels'
                # out_dtype handoff)
                gu_ref[:] = acc_ref[:, :gu_pad].astype(jnp.bfloat16)

        # ---------------- stage 2: silu-glued down + residual -------
        @pl.when(gg >= o2)
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

            _accum_block(lambda g: xcur_ref[:, g * 128:(g + 1) * 128],
                         qw2, mt2, acc_ref, sl, p2["tile_d"],
                         p2["chunks"])

            @pl.when(gg == total - 1)
            def _():
                val = (acc_ref[:, :dim]
                       + x1_ref[:].astype(jnp.float32))
                out = val.astype(out_dtype)
                xo_ref[:] = out
                of = out.astype(jnp.float32)
                ssq = jnp.sum(of * of, axis=1, keepdims=True)
                sso_ref[:] = jax.lax.rsqrt(ssq / dim + eps)

    return _kernel


def ffn_chain_supported(wo: QTensorTPU, w_gate_up: QTensorTPU,
                        w_down: QTensorTPU, m: int) -> bool:
    """VMEM feasibility + layout requirements for the chain kernel."""
    if not all(isinstance(t, QTensorTPU) for t in (wo, w_gate_up,
                                                   w_down)):
        return False
    dim, hidden2 = wo.n_out, w_gate_up.n_out
    hidden = hidden2 // 2
    if w_down.n_in != hidden or w_gate_up.n_in != dim:
        return False
    if hidden % 128 or dim % PLANAR_BLOCK:
        return False
    # full gate_up output row + acc row resident in VMEM
    return m * w_gate_up.d_pad * 6 <= (3 << 20)


def ffn_chain(attn: jax.Array, x_res: jax.Array, ffn_norm: jax.Array,
              wo: QTensorTPU, w_gate_up: QTensorTPU,
              w_down: QTensorTPU, *, eps: float,
              out_dtype=jnp.bfloat16, interpret: bool = False):
    """The post-attention chain of one decoder layer in one kernel.

    attn: (..., dim) attention output; x_res: (..., dim) residual
    stream; ffn_norm: (dim,) rms weight. Returns (x_out (..., dim)
    out_dtype, ss (..., 1) f32) — identical contract to the three
    qmatmul_fused calls it replaces.
    """
    lead = attn.shape[:-1]
    dim = wo.n_out
    hidden = w_gate_up.n_out // 2
    m = 1
    for s in lead:
        m *= s
    assert attn.shape[-1] == wo.n_in
    assert x_res.shape[-1] == dim and wo.d_pad == dim, \
        "chain needs an unpadded o-proj output"
    assert w_down.d_pad == w_down.n_out == dim

    attn2 = attn.reshape(m, wo.n_in).astype(jnp.bfloat16)
    if wo.n_pad != wo.n_in:
        attn2 = jnp.pad(attn2, ((0, 0), (0, wo.n_pad - wo.n_in)))
    res2 = x_res.reshape(m, dim)
    nw = ffn_norm.reshape(1, dim).astype(jnp.float32)

    plans = [_stage_plan(wo), _stage_plan(w_gate_up),
             _stage_plan(w_down)]
    offs = [0]
    for p in plans:
        offs.append(offs[-1] + p["steps"])
    gu_pad = w_gate_up.d_pad

    kernel = _make_chain_kernel(m, plans, offs, dim, hidden, gu_pad,
                                eps, jnp.dtype(out_dtype))

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

    in_specs = [
        pl.BlockSpec((m, plans[0]["chunks"] * PLANAR_BLOCK), attn_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, dim), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dim), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [attn2, res2, nw]
    for s, qt in enumerate((wo, w_gate_up, w_down)):
        p = plans[s]
        in_specs += [
            pl.BlockSpec((p["chunks"] * 64, p["tile_d"]), stage_map(s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p["chunks"] * 8, p["tile_d"]), stage_map(s),
                         memory_space=pltpu.VMEM),
        ]
        args += [qt.qw, qt.meta]

    acc_cols = max(p["d_pad"] for p in plans)
    xcur_cols = max(p["chunks"] * PLANAR_BLOCK for p in plans[1:])
    bytes_total = sum(
        qt.qw.size * 4 + qt.meta.size * 2
        for qt in (wo, w_gate_up, w_down)) + m * (wo.n_pad + 3 * dim) * 4
    cost = pl.CostEstimate(
        flops=2 * m * (wo.n_pad * dim + dim * gu_pad
                       + w_down.n_pad * dim),
        bytes_accessed=bytes_total,
        transcendentals=m * hidden)

    out, ss = pl.pallas_call(
        kernel,
        grid=(offs[-1],),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((m, dim), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, dim), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, acc_cols), jnp.float32),    # acc
            pltpu.VMEM((m, dim), jnp.dtype(out_dtype)),  # x1
            pltpu.VMEM((m, gu_pad), jnp.bfloat16),     # gate_up row
            pltpu.VMEM((m, 1), jnp.float32),           # ss1
            pltpu.VMEM((m, xcur_cols), jnp.bfloat16),  # current x chunk
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, dim), ss.reshape(*lead, 1)
