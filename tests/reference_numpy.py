"""Independent NumPy oracle of the Llama-2 forward pass.

Written directly from the math (not from the JAX code) so model tests
compare two independent implementations. Operates on a RawCheckpoint in
float32 throughout.
"""

import numpy as np

from llama_cu_awq_tpu.quant.packing import dequantize_np


def _deq(q):
    return dequantize_np(q.qw, q.zeros, q.scales, q.n_in)


def _rmsnorm(x, w, eps=1e-5):
    ms = np.mean(x.astype(np.float32) ** 2, axis=-1, keepdims=True) + eps
    return x / np.sqrt(ms) * w


def _rope(x, positions, theta):
    # x: (T, H, D); positions: (T,)
    T, H, D = x.shape
    half = D // 2
    inv = 1.0 / theta ** (np.arange(half) * 2.0 / D)
    ang = positions[:, None] * inv[None, :]  # (T, half)
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x0, x1 = x[..., :half], x[..., half:]
    return np.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


def _softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def numpy_forward(ckpt, tokens):
    """tokens: (T,) int -> logits (T, vocab) f32, full teacher-forced pass."""
    cfg = ckpt.config
    T = len(tokens)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = ckpt.embed.astype(np.float32)[np.asarray(tokens)]  # (T, dim)
    positions = np.arange(T)

    for layer in ckpt.layers:
        xb = _rmsnorm(x, layer.attn_norm.astype(np.float32))
        q = xb @ _deq(layer.wq)
        k = xb @ _deq(layer.wk)
        v = xb @ _deq(layer.wv)
        q = _rope(q.reshape(T, H, D), positions, cfg.rope_theta)
        k = _rope(k.reshape(T, KV, D), positions, cfg.rope_theta)
        v = v.reshape(T, KV, D)
        # GQA: query head h attends to kv head h // (H // KV)
        kv_mul = H // KV
        out = np.zeros((T, H, D), np.float32)
        for h in range(H):
            kh = k[:, h // kv_mul]  # (T, D)
            vh = v[:, h // kv_mul]
            scores = (q[:, h] @ kh.T) / np.sqrt(D)  # (T, T)
            mask = np.tril(np.ones((T, T), bool))
            scores = np.where(mask, scores, -np.inf)
            out[:, h] = _softmax(scores, axis=-1) @ vh
        x = x + out.reshape(T, H * D) @ _deq(layer.wo)
        xb = _rmsnorm(x, layer.ffn_norm.astype(np.float32))
        g = xb @ _deq(layer.w_gate)
        u = xb @ _deq(layer.w_up)
        x = x + (g / (1.0 + np.exp(-g)) * u) @ _deq(layer.w_down)

    x = _rmsnorm(x, ckpt.final_norm.astype(np.float32))
    return x @ ckpt.lm_head.astype(np.float32).T
