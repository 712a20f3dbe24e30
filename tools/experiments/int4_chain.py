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


_NEG = -1e30


def _make_chain_kernel(m, plans, offs, dim, hidden, gu_pad, eps,
                       out_dtype, has_qkv, attn_cfg=None):
    """attn_cfg (mono-layer mode): the kernel additionally runs the
    attention-step stages (attention_step.py's body) over grid steps
    [0, offs[0]) and stage 0 consumes the in-VMEM attention rows —
    the WHOLE decoder layer becomes one launch."""
    p0, p1, p2 = plans[:3]
    o0, o1, o2, o3 = offs[0], offs[1], offs[2], offs[3]
    total = offs[-1]

    def _kernel(*refs):
        it = iter(refs)
        if attn_cfg is None:
            attn_ref = next(it)
        else:
            pos_ref = next(it)
            qkvin_ref = next(it)
            cos_ref = next(it)
            sin_ref = next(it)
            k_ref = next(it)
            v_ref = next(it)
            if attn_cfg["quantized"]:
                ks_ref, vs_ref = next(it), next(it)
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
        if attn_cfg is not None:
            kn_ref = next(it)
            vn_ref = next(it)
            if attn_cfg["quantized"]:
                ksn_ref, vsn_ref = next(it), next(it)
        acc_ref = next(it)
        x1_ref = next(it)
        gu_ref = next(it)
        ss1_ref = next(it)
        xcur_ref = next(it)
        if attn_cfg is not None:
            qbd_ref = next(it)
            aacc_ref = next(it)
            am_ref = next(it)
            al_ref = next(it)
            arow_ref = next(it)

        gg = pl.program_id(0)

        # ------------- attention prefix (mono-layer mode) -------------
        if attn_cfg is not None:
            ac = attn_cfg
            n_blocks, a_blk = ac["n_blocks"], ac["a_blk"]
            H, Hp, n_kv, D = ac["H"], ac["Hp"], ac["n_kv"], ac["D"]
            kv_mul, HD, half = H // n_kv, ac["n_kv"] * ac["D"], ac["D"] // 2
            scale, quantized = ac["scale"], ac["quantized"]
            kv_dtype = ac["kv_dtype"]
            b = gg // n_blocks
            a = gg % n_blocks
            brow = pl.ds(b, 1)

            def _expand_mat():
                kv_idx = jax.lax.broadcasted_iota(jnp.int32, (n_kv, Hp), 0)
                col_kv = jax.lax.broadcasted_iota(
                    jnp.int32, (n_kv, Hp), 1) // kv_mul
                return jnp.where(kv_idx == col_kv, 1.0, 0.0)

            def online_update(k_blk, v_blk, ks_row, vs_row, valid):
                raw = jax.lax.dot_general(
                    k_blk, qbd_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
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
                m_old = am_ref[:]
                m_new = jnp.maximum(m_old,
                                    jnp.max(s, axis=0, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
                al_ref[:] = al_ref[:] * alpha + jnp.sum(
                    p, axis=0, keepdims=True)
                am_ref[:] = m_new
                if quantized:
                    vs = vs_row
                    if expand is not None:
                        vs = jax.lax.dot_general(
                            vs, expand, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    p = p * vs
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v_blk,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                aacc_ref[:] = (aacc_ref[:] * jnp.swapaxes(alpha, 0, 1)
                               + pv)

            @pl.when((gg < o0) & (a == 0))
            def _():
                cos = cos_ref[brow, :]
                sin = sin_ref[brow, :]

                def rope(x):
                    return x * cos + pltpu.roll(x, half, 1) * sin

                qkvb = qkvin_ref[brow, :]
                q = qkvb[:, :H * D].reshape(H, D).astype(jnp.float32)
                q_bf = rope(q).astype(jnp.bfloat16)
                k = qkvb[:, H * D:(H + n_kv) * D].reshape(
                    n_kv, D).astype(jnp.float32)
                k_bf = rope(k).astype(jnp.bfloat16)
                v_bf = qkvb[:, (H + n_kv) * D:].reshape(
                    n_kv, D).astype(jnp.bfloat16)

                qt = jnp.swapaxes(q_bf, 0, 1)
                if Hp != H:
                    qt = jnp.pad(qt, ((0, 0), (0, Hp - H)))
                tiled = jnp.broadcast_to(qt[None],
                                         (n_kv, D, Hp)).reshape(HD, Hp)
                r_blk = jax.lax.broadcasted_iota(
                    jnp.int32, (HD, Hp), 0) // D
                col_kv = jax.lax.broadcasted_iota(
                    jnp.int32, (HD, Hp), 1) // kv_mul
                qbd_ref[:] = jnp.where(r_blk == col_kv, tiled, 0)
                aacc_ref[:] = jnp.zeros_like(aacc_ref)
                am_ref[:] = jnp.full_like(am_ref, _NEG)
                al_ref[:] = jnp.zeros_like(al_ref)

                if quantized:
                    kf = k_bf.astype(jnp.float32)
                    vf = v_bf.astype(jnp.float32)
                    ks_new = jnp.maximum(
                        jnp.max(jnp.abs(kf), axis=1, keepdims=True)
                        / 127.0, 1e-10)
                    vs_new = jnp.maximum(
                        jnp.max(jnp.abs(vf), axis=1, keepdims=True)
                        / 127.0, 1e-10)
                    kq = jnp.round(kf / ks_new)
                    vq = jnp.round(vf / vs_new)
                    kn_ref[brow] = kq.astype(kv_dtype).reshape(
                        1, n_kv, D)
                    vn_ref[brow] = vq.astype(kv_dtype).reshape(
                        1, n_kv, D)
                    ksn_ref[brow] = jnp.swapaxes(ks_new, 0, 1)
                    vsn_ref[brow] = jnp.swapaxes(vs_new, 0, 1)
                    online_update(
                        kq.astype(jnp.bfloat16).reshape(1, HD),
                        vq.astype(jnp.bfloat16).reshape(1, HD),
                        jnp.swapaxes(ks_new, 0, 1),
                        jnp.swapaxes(vs_new, 0, 1),
                        jnp.full((1, Hp), True))
                else:
                    kn_ref[brow] = k_bf.astype(kv_dtype).reshape(
                        1, n_kv, D)
                    vn_ref[brow] = v_bf.astype(kv_dtype).reshape(
                        1, n_kv, D)
                    online_update(k_bf.reshape(1, HD),
                                  v_bf.reshape(1, HD), None, None,
                                  jnp.full((1, Hp), True))

            @pl.when((gg < o0) & (a * a_blk < pos_ref[b]))
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

            @pl.when((gg < o0) & (a == n_blocks - 1))
            def _():
                acc3 = aacc_ref[:].reshape(Hp, n_kv, D)
                kv_idx = jax.lax.broadcasted_iota(
                    jnp.int32, (Hp, n_kv, 1), 1)
                h_kv = jax.lax.broadcasted_iota(
                    jnp.int32, (Hp, n_kv, 1), 0) // kv_mul
                out = jnp.sum(jnp.where(kv_idx == h_kv, acc3, 0.0),
                              axis=1)
                l_rows = jnp.swapaxes(al_ref[:], 0, 1)
                # bf16-round through f32 storage: parity with the
                # attention_step -> wo handoff, which is bf16
                arow_ref[brow] = ((out / l_rows)[:H]
                                  .reshape(1, H * D)
                                  .astype(jnp.bfloat16)
                                  .astype(jnp.float32))

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
        @pl.when((gg >= o0) & (gg < o1))
        def _():
            gl = gg - o0
            j = gl // p0["d_tiles"]
            i = gl % p0["d_tiles"]
            sl = pl.ds(i * p0["tile_d"], p0["tile_d"])

            @pl.when(j == 0)
            def _():
                acc_ref[:, sl] = jnp.zeros((m, p0["tile_d"]), jnp.float32)

            if attn_cfg is None:
                accum_block(lambda g: attn_ref[:, g * 128:(g + 1) * 128]
                            .astype(jnp.bfloat16), qw0, mt0, sl,
                            p0["chunks"])
            else:
                # x = the attention rows left in VMEM by the prefix
                cc0 = p0["chunks"] * PLANAR_BLOCK

                @pl.when(i == 0)
                def _():
                    for jv in range(p0["n_tiles"]):
                        @pl.when(j == jv)
                        def _(jv=jv):
                            for g in range(p0["chunks"] * 4):
                                col = jv * cc0 + g * 128
                                dst = pl.ds(g * 128, 128)
                                if col >= dim:
                                    xcur_ref[:, dst] = jnp.zeros(
                                        (m, 128), jnp.bfloat16)
                                else:
                                    xcur_ref[:, dst] = arow_ref[
                                        :, col:col + 128].astype(
                                            jnp.bfloat16)

                accum_block(lambda g: xcur_ref[:, g * 128:(g + 1) * 128],
                            qw0, mt0, sl, p0["chunks"])

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


# ---------------------------------------------------------------------------
# mono-layer: attention prefix + the matmul chain in ONE launch

def mono_supported(wo, w_gate_up, w_down, m, head_dim, attn_len,
                   n_heads, n_kv, wqkv_next=None) -> bool:
    if not ffn_chain_supported(wo, w_gate_up, w_down, m, wqkv_next):
        return False
    return (head_dim % 128 == 0 and attn_len % 128 == 0
            and n_heads % n_kv == 0
            and n_heads * head_dim == wo.n_in)


def mono_layer(qkv, x_res, ffn_norm, wo, w_gate_up, w_down,
               k_cache, v_cache, pos, cos2, sinm,
               k_scale=None, v_scale=None, *, n_heads: int,
               attn_len: int | None = None, eps: float,
               wqkv_next=None, attn_norm_next=None,
               out_dtype=jnp.bfloat16, interpret: bool = False):
    """One FULL decoder layer (minus the cache row-scatters) in one
    Pallas launch: the attention-step stages (see attention_step.py)
    run over the first B*n_blocks grid steps and leave the attention
    rows in VMEM; the wo/gate_up/down(/next-qkv) chain stages then
    stream the layer's weights over them.

    qkv: (B, (H + 2*Hkv) * D) — this layer's projection row (from the
    previous layer's mono launch, stage 3). Returns (x_out (B, dim),
    ss (B, 1), k_new (B, Hkv, D), v_new, k_s, v_s[, qkv_next]) — k_s/
    v_s None unless the cache is quantized.
    """
    import numpy as np

    from llama_cu_awq_tpu.ops.pallas.batched_attention import _pick_blk

    B, A, n_kv, D = k_cache.shape
    H = n_heads
    HD = n_kv * D
    dim = wo.n_out
    hidden = w_gate_up.n_out // 2
    has_qkv = wqkv_next is not None
    quantized = k_scale is not None
    kv_dtype = k_cache.dtype
    assert qkv.shape == (B, (H + 2 * n_kv) * D)
    assert H * D == wo.n_in and wo.d_pad == dim
    assert x_res.shape == (B, dim)
    assert has_qkv == (attn_norm_next is not None)

    a_blk = _pick_blk(A, HD * k_cache.dtype.itemsize)
    n_blocks = -(-min(attn_len or A, A) // a_blk)
    Hp = max(-(-H // 128) * 128, 128)
    attn_cfg = dict(n_blocks=n_blocks, a_blk=a_blk, H=H, Hp=Hp,
                    n_kv=n_kv, D=D, scale=1.0 / float(np.sqrt(D)),
                    quantized=quantized, kv_dtype=kv_dtype)

    qts = [wo, w_gate_up, w_down] + ([wqkv_next] if has_qkv else [])
    plans = [_stage_plan(qt) for qt in qts]
    offs = [B * n_blocks]
    for p in plans:
        offs.append(offs[-1] + p["steps"])
    gu_pad = w_gate_up.d_pad

    kernel = _make_chain_kernel(B, plans, offs, dim, hidden, gu_pad,
                                eps, jnp.dtype(out_dtype), has_qkv,
                                attn_cfg)

    attn_steps = offs[0]

    def stage_map(s):
        p, off = plans[s], offs[s]

        def _map(g, pf):
            gl = jnp.clip(g - off, 0, p["steps"] - 1)
            return (gl // p["d_tiles"], gl % p["d_tiles"])

        return _map

    def kv_map(g, pf):
        s = jnp.minimum(g, attn_steps - 1)
        b = s // n_blocks
        a = s % n_blocks
        last = jnp.maximum(pf[b] - 1, 0) // a_blk
        return (b, jnp.minimum(a, last), 0, 0)

    def sc_map(g, pf):
        b, a, _, _ = kv_map(g, pf)
        return (b, a, 0)

    full_row = lambda g, pf: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((B, qkv.shape[1]), full_row,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, D), full_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, D), full_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv, D), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_blk, n_kv, D), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    # qkv goes in as f32: the kernel reads one row at the DYNAMIC index
    # b = gg // n_blocks, and Mosaic only allows dynamic sublane indexing
    # on 32-bit types (bf16 packs 2 rows per sublane word — "cannot
    # statically prove that index ... is a multiple of 2")
    args = [qkv.astype(jnp.float32), cos2.astype(jnp.float32),
            sinm.astype(jnp.float32), k_cache, v_cache]
    if quantized:
        in_specs += [pl.BlockSpec((1, a_blk, n_kv), sc_map,
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_scale, v_scale]
    in_specs += [
        pl.BlockSpec((B, dim), full_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dim), full_row, memory_space=pltpu.VMEM),
    ]
    args += [x_res, ffn_norm.reshape(1, dim).astype(jnp.float32)]
    for s in range(3):
        p = plans[s]
        in_specs += [
            pl.BlockSpec((p["chunks"] * 64, p["tile_d"]), stage_map(s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p["chunks"] * 8, p["tile_d"]), stage_map(s),
                         memory_space=pltpu.VMEM),
        ]
        args += [qts[s].qw, qts[s].meta]
    if has_qkv:
        in_specs.append(pl.BlockSpec((1, dim), full_row,
                                     memory_space=pltpu.VMEM))
        args.append(attn_norm_next.reshape(1, dim).astype(jnp.float32))
        p = plans[3]
        in_specs += [
            pl.BlockSpec((p["chunks"] * 64, p["tile_d"]), stage_map(3),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p["chunks"] * 8, p["tile_d"]), stage_map(3),
                         memory_space=pltpu.VMEM),
        ]
        args += [wqkv_next.qw, wqkv_next.meta]

    out_specs = [
        pl.BlockSpec((B, dim), full_row, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1), full_row, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, dim), jnp.dtype(out_dtype)),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    ]
    if has_qkv:
        qkv_pad = plans[3]["d_pad"]
        out_specs.append(pl.BlockSpec((B, qkv_pad), full_row,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, qkv_pad),
                                              jnp.dtype(out_dtype)))
    out_specs += [
        pl.BlockSpec((B, n_kv, D), lambda g, pf: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, n_kv, D), lambda g, pf: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape += [jax.ShapeDtypeStruct((B, n_kv, D), kv_dtype)] * 2
    if quantized:
        out_specs += [pl.BlockSpec((B, n_kv), full_row,
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((B, n_kv), jnp.float32)] * 2

    acc_cols = max(p["d_pad"] for p in plans)
    xcur_cols = max(p["chunks"] * PLANAR_BLOCK for p in plans)
    bytes_total = (sum(qt.qw.size * 4 + qt.meta.size * 2 for qt in qts)
                   + 2 * B * A * HD * k_cache.dtype.itemsize
                   + B * (qkv.shape[1] + 3 * dim) * 4)
    cost = pl.CostEstimate(
        flops=(2 * B * sum(p["n_pad"] * p["d_pad"] for p in plans)
               + 2 * 2 * B * (A + 1) * HD * Hp),
        bytes_accessed=bytes_total,
        transcendentals=B * (hidden + Hp * (A + 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(offs[-1],),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, acc_cols), jnp.float32),       # acc
            pltpu.VMEM((B, dim), jnp.dtype(out_dtype)),   # x1
            pltpu.VMEM((B, gu_pad), jnp.bfloat16),        # gate_up row
            pltpu.VMEM((B, 1), jnp.float32),              # ss1
            pltpu.VMEM((B, xcur_cols), jnp.bfloat16),     # current x
            pltpu.VMEM((HD, Hp), jnp.bfloat16),           # Q_bd
            pltpu.VMEM((Hp, HD), jnp.float32),            # attn acc
            pltpu.VMEM((1, Hp), jnp.float32),             # running max
            pltpu.VMEM((1, Hp), jnp.float32),             # running denom
            # f32 (not bf16): written one row at a time at the dynamic
            # slot index, which Mosaic forbids for packed dtypes
            pltpu.VMEM((B, H * D), jnp.float32),          # attention rows
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos.astype(jnp.int32), *args)

    it = iter(outs)
    x_out = next(it)
    ss = next(it)
    qkv_next = None
    if has_qkv:
        qkv_next = next(it)
        if wqkv_next.d_pad != wqkv_next.n_out:
            qkv_next = qkv_next[:, : wqkv_next.n_out]
    kn, vn = next(it), next(it)
    ksn = vsn = None
    if quantized:
        ksn, vsn = next(it), next(it)
    if has_qkv:
        return x_out, ss, kn, vn, ksn, vsn, qkv_next
    return x_out, ss, kn, vn, ksn, vsn
