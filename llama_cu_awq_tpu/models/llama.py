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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.io.checkpoint import RawCheckpoint, RawQWeight
from llama_cu_awq_tpu.ops.linear import dense_matmul, qmatmul
from llama_cu_awq_tpu.ops.norms import rmsnorm
from llama_cu_awq_tpu.ops.rope import apply_rope
from llama_cu_awq_tpu.quant.qtensor import QTensor, index_qtensor


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LlamaParams:
    """Model weights as a pytree; per-layer tensors stacked on axis 0.

    Mirrors TransformerWeights/PerLayerWeight (common.h:26-48) with the
    reference's fused-kernel groupings folded into the layout: wqkv is
    q|k|v concatenated along n_out (the analog of qkv_matvec_kernel,
    gpu_kernels.h:242-254) and w_gate_up is gate|up (the analog of
    ffn_matvec_silu_kernel, gpu_kernels.h:256-275).
    """

    embed: jax.Array       # (vocab, dim) fp16 — token_embedding_table
    lm_head: jax.Array     # (vocab, dim) fp16 — wcls
    final_norm: jax.Array  # (dim,) f32
    attn_norm: jax.Array   # (L, dim) f32
    ffn_norm: jax.Array    # (L, dim) f32
    wqkv: QTensor          # (L) x (dim, dim + 2*kv_dim)
    wo: QTensor            # (L) x (dim, dim)
    w_gate_up: QTensor     # (L) x (dim, 2*hidden)
    w_down: QTensor        # (L) x (hidden, dim)

    def tree_flatten(self):
        return (
            (self.embed, self.lm_head, self.final_norm, self.attn_norm,
             self.ffn_norm, self.wqkv, self.wo, self.w_gate_up, self.w_down),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class KVCache(NamedTuple):
    """(L, B, max_seq, n_kv_heads, head_dim) — reference: common.h:65-66."""

    k: jax.Array
    v: jax.Array


def init_kv_cache(cfg: ModelConfig, batch: int, max_seq: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# parameter construction

def _stack_q(raws: list[list[RawQWeight]]) -> QTensor:
    """raws: per layer, a list of RawQWeights to concat along n_out."""
    qw = np.stack([np.concatenate([r.qw for r in row], axis=1)
                   for row in raws])
    zeros = np.stack([np.concatenate([r.zeros for r in row], axis=1)
                      for row in raws])
    scales = np.stack([np.concatenate([r.scales for r in row], axis=1)
                       for row in raws])
    n_in = raws[0][0].n_in
    n_out = sum(r.n_out for r in raws[0])
    return QTensor(jnp.asarray(qw), jnp.asarray(zeros), jnp.asarray(scales),
                   n_in, n_out)


def params_from_checkpoint(ckpt: RawCheckpoint,
                           param_dtype=None) -> LlamaParams:
    """Build device-resident params from a loaded .bin checkpoint.

    param_dtype: storage dtype for embed/lm_head. None keeps the
    checkpoint's fp16 (bit-exact); bf16 is the TPU-native choice (2
    mantissa bits below fp16, MXU-direct).
    """
    def _p(a):
        return jnp.asarray(a) if param_dtype is None else jnp.asarray(
            a, param_dtype)

    return LlamaParams(
        embed=_p(ckpt.embed),
        lm_head=_p(ckpt.lm_head),
        final_norm=jnp.asarray(ckpt.final_norm, jnp.float32),
        attn_norm=jnp.asarray(
            np.stack([l.attn_norm for l in ckpt.layers]), jnp.float32),
        ffn_norm=jnp.asarray(
            np.stack([l.ffn_norm for l in ckpt.layers]), jnp.float32),
        wqkv=_stack_q([[l.wq, l.wk, l.wv] for l in ckpt.layers]),
        wo=_stack_q([[l.wo] for l in ckpt.layers]),
        w_gate_up=_stack_q([[l.w_gate, l.w_up] for l in ckpt.layers]),
        w_down=_stack_q([[l.w_down] for l in ckpt.layers]),
    )


def synthetic_params(cfg: ModelConfig, seed: int = 0) -> LlamaParams:
    """Random weights generated directly on device (benchmarks at 7B scale
    without a checkpoint on disk)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    L, dim, kv, hid, vocab = (cfg.n_layers, cfg.dim, cfg.kv_dim,
                              cfg.hidden_dim, cfg.vocab_size)

    def q(key, n_in, n_out):
        k1, k2, k3 = jax.random.split(key, 3)
        qw = jax.random.bits(k1, (L, n_in // 8, n_out), jnp.uint32)
        zeros = jax.random.randint(k2, (L, -(-n_in // 128), n_out), 0, 16,
                                   jnp.int8)
        scales = jnp.full((L, -(-n_in // 128), n_out), 0.01, jnp.float32) * (
            1.0 + 0.1 * jax.random.normal(k3, (L, -(-n_in // 128), n_out)))
        return QTensor(qw, zeros, scales, n_in, n_out)

    return LlamaParams(
        embed=jax.random.normal(ks[0], (vocab, dim), jnp.float16) * 0.02,
        lm_head=jax.random.normal(ks[1], (vocab, dim), jnp.float16) * 0.02,
        final_norm=jnp.ones((dim,), jnp.float32),
        attn_norm=jnp.ones((L, dim), jnp.float32),
        ffn_norm=jnp.ones((L, dim), jnp.float32),
        wqkv=q(ks[2], dim, dim + 2 * kv),
        wo=q(ks[3], dim, dim),
        w_gate_up=q(ks[4], dim, 2 * hid),
        w_down=q(ks[5], hid, dim),
    )


# ---------------------------------------------------------------------------
# forward pass

def _update_cache(cache_l: jax.Array, new: jax.Array,
                  pos: jax.Array) -> jax.Array:
    """Write new (B, T, H, D) into cache_l (B, S, H, D) at row pos[b]."""

    def upd(c, n, p):
        return lax.dynamic_update_slice(c, n.astype(c.dtype), (p, 0, 0))

    return jax.vmap(upd)(cache_l, new, pos)


def _attention(q, k_cache, v_cache, pos, cfg: ModelConfig,
               act_dtype) -> jax.Array:
    """GQA attention over the cache slice (reference: MultiHeadAttention,
    llama2_q4.cu:267-284 + gpu_kernels.h:142-168,279-329,357-446).

    q: (B, T, H, D); caches: (B, A, Hkv, D) already containing the current
    block's keys/values; pos: (B,) first absolute position of the block.
    """
    B, T, H, D = q.shape
    A = k_cache.shape[1]
    kv_mul = cfg.kv_mul
    # operands stay in act_dtype (bf16 -> native MXU), f32 accumulation
    qg = q.reshape(B, T, cfg.n_kv_heads, kv_mul, D)
    # scores: (B, T, Hkv, kv_mul, A), f32 accumulation, 1/sqrt(D) scale
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
    out = jnp.einsum("bthgs,bshd->bthgd", att, v_cache,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, H * D)


def forward(params: LlamaParams, cfg: ModelConfig, tokens: jax.Array,
            pos: jax.Array, cache: KVCache, *, attn_len: int | None = None,
            act_dtype=jnp.bfloat16, matmul_impl: str | None = None,
            logits_all: bool = False):
    """Run the network over a token block.

    tokens: (B, T) int32; pos: (B,) absolute position of tokens[:, 0];
    cache: KVCache whose seq axis is at least attn_len.
    attn_len: static attention window (the jit analog of the reference's
      seq-len-binned CUDA graphs, llama2_q4.cu:354-360); must satisfy
      attn_len >= max(pos) + T. Defaults to the full cache length.
    Returns (logits, cache): logits f32 (B, T, vocab) if logits_all else
    (B, vocab) for the last position.
    """
    B, T = tokens.shape
    A = attn_len or cache.k.shape[2]
    H, D, KV = cfg.n_heads, cfg.head_dim, cfg.n_kv_heads

    x = params.embed[tokens].astype(act_dtype)  # (B, T, dim) gather
    positions = pos[:, None] + jnp.arange(T)[None, :]

    def layer(x, inputs):
        (attn_norm, ffn_norm, wqkv, wo, w_gate_up, w_down,
         k_cache_l, v_cache_l) = inputs
        # --- attention block ---
        xb = rmsnorm(x, attn_norm)
        qkv = qmatmul(xb, wqkv, matmul_impl).astype(act_dtype)
        qh, kh, vh = jnp.split(qkv, [cfg.dim, cfg.dim + cfg.kv_dim], axis=-1)
        qh = qh.reshape(B, T, H, D)
        kh = kh.reshape(B, T, KV, D)
        vh = vh.reshape(B, T, KV, D)
        qh = apply_rope(qh, positions, cfg.rope_theta)
        kh = apply_rope(kh, positions, cfg.rope_theta)
        k_cache_l = _update_cache(k_cache_l, kh, pos)
        v_cache_l = _update_cache(v_cache_l, vh, pos)
        attn = _attention(qh, k_cache_l[:, :A], v_cache_l[:, :A], pos, cfg,
                          act_dtype).astype(act_dtype)
        # o-proj with fused residual accumulate (llama2_q4.cu:323)
        x = (qmatmul(attn, wo, matmul_impl)
             + x.astype(jnp.float32)).astype(act_dtype)
        # --- FFN block ---
        xb = rmsnorm(x, ffn_norm)
        gu = qmatmul(xb, w_gate_up, matmul_impl)
        g, u = jnp.split(gu, 2, axis=-1)
        h = (g * jax.nn.sigmoid(g) * u).astype(act_dtype)  # SiLU(g)*u, f32
        x = (qmatmul(h, w_down, matmul_impl)
             + x.astype(jnp.float32)).astype(act_dtype)
        return x, (k_cache_l, v_cache_l)

    # scan over layers with stacked params + per-layer cache slices
    L = cfg.n_layers
    xs = (params.attn_norm, params.ffn_norm,
          params.wqkv, params.wo, params.w_gate_up, params.w_down,
          cache.k, cache.v)

    def scan_body(x, per_layer):
        return layer(x, per_layer)

    x, (new_k, new_v) = lax.scan(scan_body, x, xs)

    x = rmsnorm(x, params.final_norm)
    if not logits_all:
        x = x[:, -1, :]
    # classifier GEMV (llama2_q4.cu:339); operands in lm_head's storage
    # dtype (fp16/bf16) with f32 accumulation, matching mat_vec_kernel
    logits = dense_matmul(x.astype(params.lm_head.dtype), params.lm_head)
    return logits, KVCache(new_k, new_v)
