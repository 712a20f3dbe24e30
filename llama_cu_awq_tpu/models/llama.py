"""Llama-2 forward pass over packed w4-g128 weights.

The TPU-native re-design of the reference's per-token kernel-launch
sequence (run_llama_network, llama2_q4.cu:286-340): one jitted function
computes embedding -> N x [rmsnorm, fused-qkv matmul, RoPE, GQA attention
over the KV cache, o-proj+residual, rmsnorm, fused gate/up+SiLU,
down-proj+residual] -> final rmsnorm -> lm_head, with layers rolled into
`lax.scan` and the whole step compiled by XLA (the role CUDA graphs play
in the reference, llama2_q4.cu:342-372).

Supports batched prefill (T > 1) — a capability the reference lacks (it
feeds prompts token by token) — and batched decode for continuous
batching. Numerics follow the reference's precision staging: activations
in `act_dtype` (fp16 in the reference; bf16 native on TPU), all
accumulations and softmax in f32.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.io.checkpoint import RawCheckpoint, RawQWeight
from llama_cu_awq_tpu.ops.linear import (
    dense_matmul,
    qmatmul,
    qmatmul_fused,
    resolved_impl,
)
from llama_cu_awq_tpu.ops.norms import RMS_EPS, rmsnorm
from llama_cu_awq_tpu.ops.rope import apply_rope
from llama_cu_awq_tpu.quant.packing import (
    build_meta,
    out_pad,
    pad_cols,
    planar_pad,
    to_planar,
)
from llama_cu_awq_tpu.quant.qtensor import QTensor, QTensorTPU


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LlamaLayer:
    """One decoder layer (PerLayerWeight, common.h:26-36) with the
    reference's fused-kernel groupings folded into the layout: wqkv is
    q|k|v concatenated along n_out (the analog of qkv_matvec_kernel,
    gpu_kernels.h:242-254) and w_gate_up is gate|up (the analog of
    ffn_matvec_silu_kernel, gpu_kernels.h:256-275)."""

    attn_norm: jax.Array   # (dim,) f32
    ffn_norm: jax.Array    # (dim,) f32
    wqkv: QTensor          # (dim, dim + 2*kv_dim)
    wo: QTensor            # (dim, dim)
    w_gate_up: QTensor     # (dim, 2*hidden)
    w_down: QTensor        # (hidden, dim)

    def tree_flatten(self):
        return ((self.attn_norm, self.ffn_norm, self.wqkv, self.wo,
                 self.w_gate_up, self.w_down), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LlamaParams:
    """Model weights as a pytree; layers kept as SEPARATE per-layer
    arrays (not stacked) so the unrolled layer loop feeds weights to
    the Pallas kernels with zero copies — a stacked layout would force
    XLA to materialize a dynamic-slice of every layer's weights each
    step, doubling HBM traffic. Mirrors TransformerWeights
    (common.h:38-48)."""

    embed: jax.Array       # (vocab, dim) fp16 — token_embedding_table
    lm_head: jax.Array     # (vocab, dim) fp16 — wcls
    final_norm: jax.Array  # (dim,) f32
    layers: list           # [LlamaLayer]

    def tree_flatten(self):
        return ((self.embed, self.lm_head, self.final_norm, self.layers),
                None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class KVCache(NamedTuple):
    """Per-layer lists of (B, max_seq, n_kv_heads, head_dim) buffers
    (reference: common.h:65-66); kept unstacked for the same zero-copy
    reason as the weights.

    Optional int8 quantized mode (an upgrade over the reference's fp16
    cache): k/v hold int8 codes and k_scale/v_scale hold per-(slot,
    position, head) f32 scales of shape (B, max_seq, n_kv_heads) —
    symmetric per-vector quantization, amax/127. Halves KV HBM traffic
    (the dominant term of batched decode) and doubles slot capacity.
    """

    k: list
    v: list
    # default must be immutable: a mutable NamedTuple default is one
    # shared instance across every KVCache ever constructed
    k_scale: tuple | list = ()
    v_scale: tuple | list = ()

    @property
    def quantized(self) -> bool:
        return bool(self.k_scale)


def init_kv_cache(cfg: ModelConfig, batch: int, max_seq: int,
                  dtype=jnp.bfloat16, quantized: bool = False,
                  kv_bits: int = 8) -> KVCache:
    shape = (batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
    n = cfg.n_layers
    if not quantized:
        return KVCache([jnp.zeros(shape, dtype) for _ in range(n)],
                       [jnp.zeros(shape, dtype) for _ in range(n)])
    if kv_bits == 4:
        # nibble-packed: two signed 4-bit codes per int8 byte along
        # head_dim (quantize_kv4) — the cache's last dim is D//2, which
        # is also how forward() detects the 4-bit mode
        shape = shape[:-1] + (cfg.head_dim // 2,)
    elif kv_bits != 8:
        raise ValueError(f"kv_bits must be 4 or 8, got {kv_bits}")
    sshape = (batch, max_seq, cfg.n_kv_heads)
    return KVCache(
        [jnp.zeros(shape, jnp.int8) for _ in range(n)],
        [jnp.zeros(shape, jnp.int8) for _ in range(n)],
        [jnp.zeros(sshape, jnp.float32) for _ in range(n)],
        [jnp.zeros(sshape, jnp.float32) for _ in range(n)])


def quantize_kv(x: jax.Array):
    """Symmetric per-vector int8: (B, T, H, D) float -> (int8 codes,
    f32 scales (B, T, H)). |x - q*s| <= s/2 elementwise."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-10)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def quantize_kv4(x: jax.Array):
    """Symmetric per-vector int4, nibble-packed (the int4-KV-cache
    direction of PAPERS.md's KV-quantization line): (B, T, H, D) float
    -> (int8 packed codes (B, T, H, D//2), f32 scales (B, T, H)).
    HALVES packing: codes[..., i] = lane i in the low nibble, lane
    i + D/2 in the high nibble, both signed two's-complement (amax/7).
    Halves (not interleave) so attention can run SPLIT dots — one per
    nibble plane — whose operands are pure elementwise unpack chains
    XLA fuses into the dot; an interleaved layout forces a materialized
    stack+reshape of the whole bf16 window (measured -46% aggregate
    serving throughput). Quarter the bf16 cache's footprint; |x - q*s|
    <= s/2 per element with s 18x coarser than int8's."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 7.0, 1e-10)
    q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(jnp.int8)
    d2 = q.shape[-1] // 2
    packed = (q[..., :d2] & 0x0F) | (q[..., d2:] << 4)
    return packed.astype(jnp.int8), s


def _unpack_kv4(codes: jax.Array, scales: jax.Array, dtype):
    """(..., H, D//2) int8 codes + (..., H) scales -> (lo, hi) halves of
    shape (..., H, D//2) in dtype. Arithmetic int8 shifts sign-extend;
    each half is a pure elementwise chain (fusable into a dot)."""
    sc = scales[..., None].astype(dtype)
    lo = (jnp.left_shift(codes, 4) >> 4).astype(dtype) * sc
    hi = (codes >> 4).astype(dtype) * sc
    return lo, hi


def dequant_kv4(codes: jax.Array, scales: jax.Array, dtype) -> jax.Array:
    """Full unpack (tests / reference path): halves concatenated back to
    (..., H, D). The attention path uses _unpack_kv4's split halves
    instead, which fuse into the score/AV dots."""
    lo, hi = _unpack_kv4(codes, scales, dtype)
    return jnp.concatenate([lo, hi], axis=-1)


# ---------------------------------------------------------------------------
# parameter construction

def _fuse_q(row: list[RawQWeight], tpu_layout: bool):
    """Concat a list of RawQWeights along n_out into one device QTensor."""
    qw = np.concatenate([r.qw for r in row], axis=1)
    zeros = np.concatenate([r.zeros for r in row], axis=1)
    scales = np.concatenate([r.scales for r in row], axis=1)
    n_in = row[0].n_in
    n_out = sum(r.n_out for r in row)
    if not tpu_layout:
        return QTensor(jnp.asarray(qw), jnp.asarray(zeros),
                       jnp.asarray(scales), n_in, n_out)
    d_pad = out_pad(n_out)
    planar = pad_cols(to_planar(qw, n_in), d_pad)
    meta = build_meta(scales, zeros, n_in, d_pad)
    return QTensorTPU(jnp.asarray(planar), jnp.asarray(meta), n_in, n_out)


def params_from_checkpoint(ckpt: RawCheckpoint, param_dtype=None,
                           tpu_layout: bool = False) -> LlamaParams:
    """Build device-resident params from a loaded .bin checkpoint.

    param_dtype: storage dtype for embed/lm_head. None keeps the
    checkpoint's fp16 (bit-exact); bf16 is the TPU-native choice (2
    mantissa bits below fp16, MXU-direct).
    tpu_layout: repack quantized tensors into the planar Pallas-kernel
    layout (QTensorTPU) instead of the canonical QTensor.
    """
    def _p(a):
        return jnp.asarray(a) if param_dtype is None else jnp.asarray(
            a, param_dtype)

    layers = [
        LlamaLayer(
            attn_norm=jnp.asarray(l.attn_norm, jnp.float32),
            ffn_norm=jnp.asarray(l.ffn_norm, jnp.float32),
            wqkv=_fuse_q([l.wq, l.wk, l.wv], tpu_layout),
            wo=_fuse_q([l.wo], tpu_layout),
            w_gate_up=_fuse_q([l.w_gate, l.w_up], tpu_layout),
            w_down=_fuse_q([l.w_down], tpu_layout),
        )
        for l in ckpt.layers
    ]
    return LlamaParams(
        embed=_p(ckpt.embed),
        lm_head=_p(ckpt.lm_head),
        final_norm=jnp.asarray(ckpt.final_norm, jnp.float32),
        layers=layers,
    )


def synthetic_params(cfg: ModelConfig, seed: int = 0,
                     tpu_layout: bool = True,
                     param_dtype=jnp.bfloat16) -> LlamaParams:
    """Random weights generated directly on device (benchmarks at 7B scale
    without a checkpoint on disk). embed/lm_head default to bf16, the
    TPU-native storage (real checkpoints keep fp16 unless converted)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 2 + cfg.n_layers)
    dim, kv, hid, vocab = cfg.dim, cfg.kv_dim, cfg.hidden_dim, cfg.vocab_size

    def q(key, n_in, n_out):
        k1, k2, k3 = jax.random.split(key, 3)
        if tpu_layout:
            n_pad = planar_pad(n_in)
            d_pad = out_pad(n_out)
            g, g_pad = -(-n_in // 128), n_pad // 128
            qw = jax.random.bits(k1, (n_pad // 8, d_pad), jnp.uint32)
            scales = 0.01 * (1.0 + 0.1 * jax.random.normal(
                k3, (g_pad, d_pad), jnp.float32))
            valid = ((jnp.arange(g_pad) < g)[:, None]
                     & (jnp.arange(d_pad) < n_out)[None, :])
            scales = jnp.where(valid, scales, 0.0)
            z128 = jnp.full((g_pad, d_pad), 8.0 + 128.0)  # zero point 8
            meta = jnp.stack([scales, z128], axis=1).astype(
                jnp.bfloat16).reshape(2 * g_pad, d_pad)
            return QTensorTPU(qw, meta, n_in, n_out)
        qw = jax.random.bits(k1, (n_in // 8, n_out), jnp.uint32)
        zeros = jax.random.randint(k2, (-(-n_in // 128), n_out), 0, 16,
                                   jnp.int8)
        scales = jnp.full((-(-n_in // 128), n_out), 0.01, jnp.float32) * (
            1.0 + 0.1 * jax.random.normal(k3, (-(-n_in // 128), n_out)))
        return QTensor(qw, zeros, scales, n_in, n_out)

    def layer(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return LlamaLayer(
            attn_norm=jnp.ones((dim,), jnp.float32),
            ffn_norm=jnp.ones((dim,), jnp.float32),
            wqkv=q(k1, dim, dim + 2 * kv),
            wo=q(k2, dim, dim),
            w_gate_up=q(k3, dim, 2 * hid),
            w_down=q(k4, hid, dim),
        )

    return LlamaParams(
        embed=jax.random.normal(ks[0], (vocab, dim), param_dtype) * 0.02,
        lm_head=jax.random.normal(ks[1], (vocab, dim), param_dtype) * 0.02,
        final_norm=jnp.ones((dim,), jnp.float32),
        layers=[layer(ks[2 + i]) for i in range(cfg.n_layers)],
    )


def quantize_lm_head(params: LlamaParams, bits: int = 8,
                     tpu_layout: bool | None = None) -> LlamaParams:
    """Opt-in: quantize the lm_head — the one unquantized weight on the
    per-token critical path of the reference design (262 MB at 7B,
    gpu_kernels.h:109-139).

    bits=8: per-row symmetric int8 (quant/int8.py), near-lossless.
    bits=4: w4-g128 like every other weight (grouped along the input
    dim), served by the same fused int4 Pallas kernel — 1/4 the read at
    a real (AWQ-class) quantization error; use when throughput beats
    the last fraction of a point of perplexity.
    Not supported under TP (the vocab-sharded lm_head stays bf16)."""
    if bits == 8:
        from llama_cu_awq_tpu.quant.int8 import quantize_dense_int8

        head = quantize_dense_int8(params.lm_head)
    elif bits == 4:
        from llama_cu_awq_tpu.ops.linear import _on_tpu
        from llama_cu_awq_tpu.quant.qtensor import QTensor, to_tpu_layout

        # fetch the (vocab, dim) head in row chunks: one monolithic
        # ~262 MB device_get intermittently hangs the tunneled TPU
        # transport (measured: minutes-long stalls with zero progress),
        # while chunked gets stream fine
        lm = params.lm_head
        w = np.concatenate(
            [np.asarray(lm[i:i + 2048], np.float32)
             for i in range(0, lm.shape[0], 2048)], axis=0).T
        head = QTensor.quantize(w)
        if tpu_layout if tpu_layout is not None else _on_tpu():
            head = to_tpu_layout(head)
    else:
        raise ValueError(f"unsupported lm_head bits: {bits}")
    return LlamaParams(embed=params.embed, lm_head=head,
                       final_norm=params.final_norm, layers=params.layers)


# ---------------------------------------------------------------------------
# forward pass

def _update_cache(cache_l: jax.Array, new: jax.Array,
                  pos: jax.Array) -> jax.Array:
    """Write new (B, T, H, D) into cache_l (B, S, H, D) at row pos[b].

    The decode path (T == 1) must use a scatter XLA can prove in-place:
    a vmap'd dynamic_update_slice lowers to a batched scatter that
    COPIES the whole cache every step (~2.8 ms/step at 7B/B=16 on v5e,
    measured); .at[].set with unique_indices + promise_in_bounds updates
    in place (~0.1 ms). The engine guarantees pos[b] < S (chunk lengths
    are capped at the cache boundary).
    """
    if new.shape[1] == 1:
        return cache_l.at[jnp.arange(cache_l.shape[0]), pos].set(
            new[:, 0].astype(cache_l.dtype), unique_indices=True,
            indices_are_sorted=True, mode="promise_in_bounds")

    def upd(c, n, p):
        start = (p,) + (0,) * (c.ndim - 1)
        return lax.dynamic_update_slice(c, n.astype(c.dtype), start)

    return jax.vmap(upd)(cache_l, new, pos)


def _attention(q, k_cache, v_cache, pos, act_dtype,
               impl: str | None = None) -> jax.Array:
    """GQA attention over the cache slice (reference: MultiHeadAttention,
    llama2_q4.cu:267-284 + gpu_kernels.h:142-168,279-329,357-446).

    q: (B, T, H, D); caches: (B, A, Hkv, D) already containing the current
    block's keys/values; pos: (B,) first absolute position of the block.
    Head counts come from the operand shapes so the same code serves
    full and tensor-parallel (per-shard) views.

    (A per-head blockwise "flash" decode kernel lived here through
    round 3 and was retired: measured dominated at every shape — einsum
    wins <= 512-token windows, the fused_step kernel wins >= 1024;
    PERFORMANCE.md round-4.)
    """
    B, T, H, D = q.shape
    # kv4: caches arrive as (codes, scales) tuples — nibble-halves
    # packed int4 (quantize_kv4). Scores and A.V run as SPLIT dots, one
    # per nibble plane, so each operand stays a fusable elementwise
    # unpack chain and no full bf16 window is ever materialized.
    kv4 = isinstance(k_cache, tuple)
    if kv4:
        k_codes, k_s = k_cache
        A, n_kv = k_codes.shape[1], k_codes.shape[2]
    else:
        A, n_kv = k_cache.shape[1], k_cache.shape[2]
    kv_mul = H // n_kv
    # operands stay in act_dtype (bf16 -> native MXU), f32 accumulation
    qg = q.reshape(B, T, n_kv, kv_mul, D)
    # scores: (B, T, Hkv, kv_mul, A), f32 accumulation, 1/sqrt(D) scale
    if kv4:
        d2 = D // 2
        k_lo, k_hi = _unpack_kv4(k_codes, k_s, act_dtype)
        scores = (jnp.einsum("bthgd,bshd->bthgs", qg[..., :d2], k_lo,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("bthgd,bshd->bthgs", qg[..., d2:], k_hi,
                               preferred_element_type=jnp.float32))
    else:
        scores = jnp.einsum("bthgd,bshd->bthgs", qg, k_cache,
                            preferred_element_type=jnp.float32)
    scores = scores * (1.0 / np.sqrt(D))
    # causal mask: key position s visible iff s <= pos + t
    s_idx = jnp.arange(A)
    t_idx = jnp.arange(T)
    limit = pos[:, None] + t_idx[None, :]           # (B, T)
    mask = s_idx[None, None, :] <= limit[:, :, None]  # (B, T, A)
    scores = jnp.where(mask[:, :, None, None, :], scores, -jnp.inf)
    # reference stages scores through fp16 before softmax (att buffer is
    # half, gpu_kernels.h:167); stage through act_dtype for parity
    scores = scores.astype(act_dtype).astype(jnp.float32)
    att = jax.nn.softmax(scores, axis=-1)
    att = att.astype(act_dtype)
    if kv4:
        v_lo, v_hi = _unpack_kv4(v_cache[0], v_cache[1], act_dtype)
        out = jnp.concatenate(
            [jnp.einsum("bthgs,bshd->bthgd", att, v_lo,
                        preferred_element_type=jnp.float32),
             jnp.einsum("bthgs,bshd->bthgd", att, v_hi,
                        preferred_element_type=jnp.float32)], axis=-1)
    else:
        out = jnp.einsum("bthgs,bshd->bthgd", att, v_cache,
                         preferred_element_type=jnp.float32)
    return out.reshape(B, T, H * D)


def _post_attention(attn, x, ss, layer, fused, tp_axis, matmul_impl,
                    act_dtype):
    """o-proj + residual + FFN for one layer; returns (x, next rms ss).

    fused: o-proj + residual + next rms scale in one kernel, then
    gate/up with the rms apply fused, then SwiGLU + down-proj +
    residual + next rms scale (the reference's accum flag +
    ffn_matvec_silu_kernel, gpu_kernels.h:213-275). Unfused: the same
    math as separate ops, with psum over the tp axis after the
    row-parallel o/down projections (llama2_q4.cu:323).
    """
    if fused and tp_axis:
        # tensor-parallel fused path: the row-parallel o/down kernels
        # emit PRE-psum partials (their prologues — rms-apply, SwiGLU —
        # act on replicated/elementwise-per-shard data so they stay in
        # the kernel), and the residual-add + next-rms-scale epilogues
        # move AFTER the collective, where XLA fuses them into the psum
        # consumer. Expected per-chip cost vs single-device fused: two
        # f32 psums per layer plus the two epilogues as XLA fusions
        # (~the glue the epilogue fusion saves, paid only on the
        # row-parallel pair); the prologue fusions and the fused qkv
        # prescale are retained.
        def after_psum(part, res):
            xf = lax.psum(part, tp_axis) + res.astype(jnp.float32)
            ss = jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + RMS_EPS)
            return xf.astype(act_dtype), ss

        part, _ = qmatmul_fused(attn, layer.wo, matmul_impl,
                                out_dtype=jnp.float32)
        x, ss = after_psum(part, x)
        gu, _ = qmatmul_fused(x, layer.w_gate_up, matmul_impl,
                              prescale=(ss, layer.ffn_norm),
                              out_dtype=act_dtype)
        g, u = jnp.split(gu, 2, axis=-1)
        part, _ = qmatmul_fused(g, layer.w_down, matmul_impl,
                                silu_u=u, out_dtype=jnp.float32)
        return after_psum(part, x)
    if fused:
        x, ss = qmatmul_fused(attn, layer.wo, matmul_impl,
                              residual=x, emit_ss_eps=RMS_EPS,
                              out_dtype=act_dtype)
        gu, _ = qmatmul_fused(x, layer.w_gate_up, matmul_impl,
                              prescale=(ss, layer.ffn_norm),
                              out_dtype=act_dtype)
        g, u = jnp.split(gu, 2, axis=-1)
        x, ss = qmatmul_fused(g, layer.w_down, matmul_impl,
                              silu_u=u, residual=x,
                              emit_ss_eps=RMS_EPS,
                              out_dtype=act_dtype)
        return x, ss
    o_part = qmatmul(attn, layer.wo, matmul_impl)
    if tp_axis:
        o_part = lax.psum(o_part, tp_axis)
    x = (o_part + x.astype(jnp.float32)).astype(act_dtype)
    xb = rmsnorm(x, layer.ffn_norm)
    gu = qmatmul(xb, layer.w_gate_up, matmul_impl)
    g, u = jnp.split(gu, 2, axis=-1)
    h = (g * jax.nn.sigmoid(g) * u).astype(act_dtype)  # SiLU(g)*u, f32
    d_part = qmatmul(h, layer.w_down, matmul_impl)
    if tp_axis:
        d_part = lax.psum(d_part, tp_axis)
    return (d_part + x.astype(jnp.float32)).astype(act_dtype), None


def _post_attention_chained(attn, x, ss, layer, next_layer, matmul_impl,
                            act_dtype):
    """Fused _post_attention variant that CHAINS the down-proj with the
    NEXT layer's qkv projection in one Pallas launch
    (ops/pallas/down_qkv.py): o and gate_up keep their measured-winning
    standalone kernels; the down->qkv boundary — where the round-2/3
    XProf attribution placed the largest exposed staging cost — is
    welded. Returns (x, ss, qkv_next)."""
    from llama_cu_awq_tpu.ops.linear import _on_tpu
    from llama_cu_awq_tpu.ops.pallas.down_qkv import down_qkv_fused

    x1, ss1 = qmatmul_fused(attn, layer.wo, matmul_impl,
                            residual=x, emit_ss_eps=RMS_EPS,
                            out_dtype=act_dtype)
    gu, _ = qmatmul_fused(x1, layer.w_gate_up, matmul_impl,
                          prescale=(ss1, layer.ffn_norm),
                          out_dtype=act_dtype)
    g, u = jnp.split(gu, 2, axis=-1)
    x2, ss2, qkv_next = down_qkv_fused(
        g, u, x1, layer.w_down, next_layer.wqkv, next_layer.attn_norm,
        eps=RMS_EPS, out_dtype=act_dtype, interpret=not _on_tpu())
    return x2, ss2, qkv_next.astype(act_dtype)


def forward(params: LlamaParams, cfg: ModelConfig, tokens: jax.Array,
            pos: jax.Array, cache: KVCache, *, attn_len: int | None = None,
            act_dtype=jnp.bfloat16, matmul_impl: str | None = None,
            attn_impl: str | None = None,
            logits_all: bool = False, no_logits: bool = False,
            tp_axis: str | None = None, tp_size: int = 1,
            fused: bool | None = None):
    """Run the network over a token block.

    tokens: (B, T) int32; pos: (B,) absolute position of tokens[:, 0];
    cache: KVCache whose seq axis is at least attn_len.
    attn_len: static attention window (the jit analog of the reference's
      seq-len-binned CUDA graphs, llama2_q4.cu:354-360); must satisfy
      attn_len >= max(pos) + T. Defaults to the full cache length.
    tp_axis/tp_size: when called inside shard_map with Megatron-style
      tensor parallelism, weights/cache/heads are per-device shards;
      activations stay replicated, with a psum over tp_axis after the
      row-parallel o/down projections and an all_gather for the
      vocab-sharded lm_head (see parallel/tp.py).
    Returns (logits, cache): logits f32 (B, T, vocab) if logits_all else
    (B, vocab) for the last position.
    """
    B, T = tokens.shape
    A = attn_len or cache.k[0].shape[1]
    H, D, KV = cfg.n_heads // tp_size, cfg.head_dim, cfg.n_kv_heads // tp_size
    dim_q, dim_kv = cfg.dim // tp_size, cfg.kv_dim // tp_size

    # fused layer path: pull the per-matmul glue (rmsnorm apply, SwiGLU,
    # residual adds) into the Pallas kernels — batch-1 decode is exposed-
    # latency-bound on that glue (see ops/pallas/int4_matmul.py). The rms
    # scale chains kernel-to-kernel as a (B, T, 1) scalar. Under TP the
    # row-parallel kernels emit pre-psum partials and the residual/ss
    # epilogues run after the collective (_post_attention's tp branch),
    # so the prologue fusions are kept on every shard.
    if fused is None:
        fused = (bool(params.layers)
                 and isinstance(params.layers[0].wqkv, QTensorTPU)
                 and resolved_impl(matmul_impl) == "pallas")

    x = params.embed[tokens].astype(act_dtype)  # (B, T, dim) gather
    positions = pos[:, None] + jnp.arange(T)[None, :]
    ss = None
    if fused:
        xf = x.astype(jnp.float32)
        ss = jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + RMS_EPS)

    # attn_impl "fused_step": the whole attention step (qkv split, RoPE,
    # KV quantize, current-token + windowed attention) runs as ONE
    # Pallas kernel per layer (ops/pallas/attention_step.py) — only the
    # cache row-scatters stay in XLA, and they land AFTER attention
    # (the current token's k/v enters the kernel from the qkv row, so
    # the write->read serialization disappears)
    full_A0 = cache.k[0].shape[1] if cache.k else A
    # 4-bit KV mode: detected from the packed cache's halved last dim
    # (init_kv_cache(kv_bits=4)). fused_step speaks the nibble packing
    # natively (attention_step kv_bits=4: split-plane dots, in-kernel
    # quantize+pack — so the capacity mode composes with the deep-window
    # kernel win instead of cancelling it, VERDICT r3 item 5);
    # batched still forces the einsum path (dequant_kv4 split dots).
    # LLAMA_TPU_FSTEP_KV4=0 is the kill switch back to einsum.
    kv4 = (cache.quantized and bool(cache.k)
           and cache.k[0].shape[-1] == cfg.head_dim // 2)
    kv4_fstep_ok = (not kv4
                    or (os.environ.get("LLAMA_TPU_FSTEP_KV4", "1") == "1"
                        # the kernel's lane-128 diagonal extraction
                        # needs half-planes of 128 lanes, or head PAIRS
                        # of 64-lane planes (attention_step kv4 notes)
                        and ((cfg.head_dim // 2) % 128 == 0
                             or (cfg.head_dim == 128 and KV % 2 == 0))))
    # Under TP the kernel runs per shard: it is head-parallel and every
    # shape it sees (H, KV, qkv row, cache) is already the local shard's
    # — validated against the einsum TP path on the 8-device virtual
    # mesh (tests/test_tp.py::test_tp_fused_step_parity). Real-chip TP
    # measurement needs >= 2 chips (unavailable); LLAMA_TPU_FSTEP_TP=0
    # reverts TP to the einsum path.
    fstep_tp_ok = (tp_axis is None
                   or os.environ.get("LLAMA_TPU_FSTEP_TP", "1") == "1")
    shapes_ok = (T == 1 and cfg.head_dim % 128 == 0
                 and full_A0 % 128 == 0 and H % KV == 0
                 and kv4_fstep_ok and fstep_tp_ok)
    # attn_impl "auto" (the engines' default): einsum attention for
    # shallow windows, the fused_step kernel once the window is deep
    # enough that streaming the KV window through one kernel beats
    # XLA's staged einsum fusions. Measured crossover on v5e 7B
    # batch-1 decode (PERFORMANCE.md round-2 chip results): einsum
    # wins at the 512 bucket (185.9 vs 176.6 tok/s), fused_step wins
    # at the 2048 bucket (150.5 vs 119.4, +26%) and at the 1024 bucket
    # (166.6 vs 147.1, +13% — round-3 crossover measurement, so the
    # 1024 default threshold is now chip-validated at its boundary).
    # attn_len is static under jit, so each bucket's step compiles its
    # own choice.
    if attn_impl == "auto":
        thresh = int(os.environ.get("LLAMA_TPU_FSTEP_MIN_WINDOW", "1024"))
        attn_impl = ("fused_step"
                     if shapes_ok and fused and A >= thresh else None)
    # (the "mono" whole-layer launch and the o-proj+FFN "chain" kernel
    # were retired in round 4: measured losing at every shape — 7B
    # 168-170 vs 186, 13B 83.5/84.7 vs 89.5 — they live on in
    # tools/experiments/int4_chain.py with their parity tests)
    if attn_impl == "mono":
        attn_impl = "fused_step"
    fstep = (attn_impl == "fused_step" and shapes_ok)
    if attn_impl == "fused_step" and T == 1 and not fstep:
        import warnings

        if kv4:
            warnings.warn(
                "attn_impl='fused_step' with the int4 KV cache is "
                "disabled (LLAMA_TPU_FSTEP_KV4=0); falling back to "
                "the einsum path (dequant_kv4)", stacklevel=2)
        else:
            warnings.warn(
                f"attn_impl='fused_step' needs head_dim % 128 == 0 and "
                f"cache len % 128 == 0 (got head_dim={cfg.head_dim}, "
                f"cache len={full_A0}); falling back to the einsum path",
                stacklevel=2)
    if fstep:
        from llama_cu_awq_tpu.ops.linear import _on_tpu
        from llama_cu_awq_tpu.ops.pallas.attention_step import (
            attention_step, rope_rows)

        cos2, sinm = rope_rows(pos, cfg.head_dim, cfg.rope_theta)

    # T > 1 (teacher-forced prefill / perplexity) attention: the
    # blockwise causal flash kernel (ops/pallas/prefill_attention.py)
    # replaces the einsum path's materialized (B, T, Hkv, kv_mul, A)
    # f32 score tensor. attn_impl="einsum" (or the env kill-switch
    # LLAMA_TPU_PREFILL_ATTN=einsum) forces the plain path; kv4 stays
    # on einsum (the kernel doesn't speak the nibble packing). Under TP
    # the kernel runs per shard over the local kv heads; virtual-mesh
    # parity in tests/test_tp.py, real-chip TP unmeasurable here —
    # LLAMA_TPU_PFK_TP=0 reverts TP to einsum.
    # min-T gate: small teacher-forced blocks (speculative verify
    # blocks, T = spec_k+1) ride the measured einsum path — the kernel
    # was A/B'd at block sizes 128+ only, and the tuned spec profiles
    # predate it (ADVICE r4). LLAMA_TPU_PFK_MIN_T=2 opts small blocks in.
    pfk_min_t = int(os.environ.get("LLAMA_TPU_PFK_MIN_T", "64"))
    pfk_tp_ok = (tp_axis is None
                 or os.environ.get("LLAMA_TPU_PFK_TP", "1") == "1")
    pfk = (T >= max(2, pfk_min_t) and not kv4 and pfk_tp_ok
           and attn_impl in (None, "fused_step", "batched",
                             "batched_static")
           and os.environ.get("LLAMA_TPU_PREFILL_ATTN",
                              "pallas") != "einsum")
    if pfk:
        from llama_cu_awq_tpu.ops.pallas import prefill_attention as pf

        pfk = pf.supports(T, H, D, full_A0, KV)

    # down->next-qkv chained kernel (ops/pallas/down_qkv.py): the last
    # matmul of layer l and the first of layer l+1 run as one 2-stage
    # Pallas grid, so qkv's first weight blocks prefetch during the
    # down stage — attacking the ~0.7 ms/step of exposed qkv staging
    # the round-2 XProf attributed. Opt-in (LLAMA_TPU_DOWN_QKV=1; the
    # tuned bench profiles promote it where chip-measured faster).
    dq_chain = (fused and tp_axis is None
                and os.environ.get("LLAMA_TPU_DOWN_QKV", "0") == "1")
    if dq_chain:
        from llama_cu_awq_tpu.ops.pallas.down_qkv import (
            supported as _dq_supported)

        dq_chain = (len(params.layers) > 1
                    and _dq_supported(params.layers[0].w_down,
                                      params.layers[1].wqkv, B * T))

    # unrolled layer loop: per-layer weights/caches are separate arrays,
    # so Pallas kernels and attention read them with zero copies (a
    # lax.scan over stacked tensors would materialize a dynamic-slice of
    # every layer's weights each step — ~2x HBM traffic)
    new_k, new_v, new_ks, new_vs = [], [], [], []

    qkv_pending = None
    for l, layer in enumerate(params.layers):
        # --- attention block ---
        if qkv_pending is not None:
            qkv, qkv_pending = qkv_pending, None
        elif fused:
            qkv, _ = qmatmul_fused(x, layer.wqkv, matmul_impl,
                                   prescale=(ss, layer.attn_norm),
                                   out_dtype=act_dtype)
        else:
            xb = rmsnorm(x, layer.attn_norm)
            qkv = qmatmul(xb, layer.wqkv, matmul_impl).astype(act_dtype)
        if fstep:
            attn_k, kn, vn, ksn, vsn = attention_step(
                qkv[:, 0], cache.k[l], cache.v[l], pos, cos2, sinm,
                cache.k_scale[l] if cache.quantized else None,
                cache.v_scale[l] if cache.quantized else None,
                n_heads=H, attn_len=A, kv_bits=4 if kv4 else 8,
                interpret=not _on_tpu())
            new_k.append(_update_cache(cache.k[l], kn[:, None], pos))
            new_v.append(_update_cache(cache.v[l], vn[:, None], pos))
            if cache.quantized:
                new_ks.append(
                    _update_cache(cache.k_scale[l], ksn[:, None], pos))
                new_vs.append(
                    _update_cache(cache.v_scale[l], vsn[:, None], pos))
            attn = attn_k.reshape(B, 1, H * D).astype(act_dtype)
            if dq_chain and l + 1 < len(params.layers):
                x, ss, qkv_pending = _post_attention_chained(
                    attn, x, ss, layer, params.layers[l + 1],
                    matmul_impl, act_dtype)
            else:
                x, ss = _post_attention(attn, x, ss, layer, fused,
                                        tp_axis, matmul_impl, act_dtype)
            continue
        qh, kh, vh = jnp.split(qkv, [dim_q, dim_q + dim_kv], axis=-1)
        qh = qh.reshape(B, T, H, D)
        kh = kh.reshape(B, T, KV, D)
        vh = vh.reshape(B, T, KV, D)
        qh = apply_rope(qh, positions, cfg.rope_theta)
        kh = apply_rope(kh, positions, cfg.rope_theta)
        # attn_impl "batched": the serving-shape Pallas kernel
        # (ops/pallas/batched_attention.py) — int8-NATIVE for the
        # quantized cache (codes + scales go straight to the kernel;
        # no dequantized window is materialized)
        full_A = cache.k[l].shape[1] if cache.k else A
        batched = (T == 1
                   and attn_impl in ("batched", "batched_static")
                   and cfg.head_dim % 128 == 0 and full_A % 128 == 0
                   and not kv4)
        if (attn_impl in ("batched", "batched_static") and T == 1
                and not batched and l == 0):
            import warnings

            if kv4:
                warnings.warn(
                    "attn_impl='batched' does not support the int4 "
                    "nibble-packed KV cache (--kv-bits 4); falling back "
                    "to the einsum path (dequant_kv4)", stacklevel=2)
            else:
                warnings.warn(
                    f"attn_impl='batched' needs head_dim % 128 == 0 and "
                    f"cache len % 128 == 0 (got head_dim={cfg.head_dim}, "
                    f"cache len={full_A}); falling back to the einsum "
                    f"path", stacklevel=2)
        if cache.quantized:
            qfn = quantize_kv4 if kv4 else quantize_kv
            kq, ks = qfn(kh)
            vq, vs = qfn(vh)
            k_cache_l = _update_cache(cache.k[l], kq, pos)
            v_cache_l = _update_cache(cache.v[l], vq, pos)
            ks_l = _update_cache(cache.k_scale[l], ks, pos)
            vs_l = _update_cache(cache.v_scale[l], vs, pos)
            new_ks.append(ks_l)
            new_vs.append(vs_l)
            if batched or pfk:
                # full window, unsliced: a [:, :A] slice feeding a
                # pallas custom call cannot fuse (XLA materializes a
                # copy of the cache); the kernel's per-slot early exit
                # already reads only up to pos[b]
                k_att, v_att = k_cache_l, v_cache_l
                scales = (ks_l, vs_l)
            elif kv4:
                # codes+scales go to _attention's split-dot path; the
                # nibble unpack fuses into each dot's operand read
                k_att = (k_cache_l[:, :A], ks_l[:, :A])
                v_att = (v_cache_l[:, :A], vs_l[:, :A])
            else:
                # dequantize the window on the fly; XLA fuses the int8
                # load + scale multiply into the attention dot's operand
                k_att = (k_cache_l[:, :A].astype(act_dtype)
                         * ks_l[:, :A, :, None].astype(act_dtype))
                v_att = (v_cache_l[:, :A].astype(act_dtype)
                         * vs_l[:, :A, :, None].astype(act_dtype))
        else:
            k_cache_l = _update_cache(cache.k[l], kh, pos)
            v_cache_l = _update_cache(cache.v[l], vh, pos)
            if batched or pfk:  # unsliced: see the quantized branch
                k_att, v_att = k_cache_l, v_cache_l
            else:
                k_att, v_att = k_cache_l[:, :A], v_cache_l[:, :A]
            scales = (None, None)
        new_k.append(k_cache_l)
        new_v.append(v_cache_l)
        if batched:
            from llama_cu_awq_tpu.ops.linear import _on_tpu
            from llama_cu_awq_tpu.ops.pallas import batched_attention as ba

            attn = ba.batched_decode_attention(
                qh[:, 0], k_att, v_att, pos, scales[0], scales[1],
                attn_len=A, early_exit=attn_impl != "batched_static",
                interpret=not _on_tpu()).reshape(B, 1, H * D).astype(
                    act_dtype)
        elif pfk:
            from llama_cu_awq_tpu.ops.linear import _on_tpu

            attn = pf.prefill_attention(
                qh, k_att, v_att, pos, scales[0], scales[1],
                attn_len=A, interpret=not _on_tpu()).reshape(
                    B, T, H * D).astype(act_dtype)
        else:
            attn = _attention(qh, k_att, v_att, pos,
                              act_dtype, attn_impl).astype(act_dtype)
        if dq_chain and l + 1 < len(params.layers):
            x, ss, qkv_pending = _post_attention_chained(
                attn, x, ss, layer, params.layers[l + 1],
                matmul_impl, act_dtype)
        else:
            x, ss = _post_attention(attn, x, ss, layer, fused, tp_axis,
                                    matmul_impl, act_dtype)

    if no_logits:
        # teacher-forced prompt step: only the cache matters (the
        # reference burns a full lm_head GEMV per prompt token;
        # llama2_q4.cu:336-339 — skipping it is free accuracy-wise)
        return None, KVCache(new_k, new_v, new_ks or (), new_vs or ())
    if fused:
        x = (x.astype(jnp.float32) * ss
             * params.final_norm.astype(jnp.float32)).astype(act_dtype)
    else:
        x = rmsnorm(x, params.final_norm)
    if not logits_all:
        x = x[:, -1, :]
    # classifier GEMV (llama2_q4.cu:339); operands in lm_head's storage
    # dtype (fp16/bf16, or int8/w4 when quantize_lm_head opted in) with
    # f32 accumulation, matching mat_vec_kernel. Under TP the lm_head is
    # vocab-sharded; gather the logits shards.
    if isinstance(params.lm_head, (QTensor, QTensorTPU)):
        logits = qmatmul(x.astype(act_dtype), params.lm_head, matmul_impl)
    else:
        logits = dense_matmul(x.astype(params.lm_head.dtype),
                              params.lm_head, matmul_impl)
    if tp_axis:
        logits = lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                tiled=True)
    return logits, KVCache(new_k, new_v, new_ks or (), new_vs or ())
