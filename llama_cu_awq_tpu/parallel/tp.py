"""Megatron-style tensor parallelism for the quantized Llama model.

Capability extension over the single-GPU reference (SURVEY.md §2.4),
built the TPU way: weights are laid out *per shard* on the host, placed
as global jax.Arrays with NamedShardings over the ICI mesh axis, and the
forward pass runs under jax.shard_map with explicit collectives —
activations replicated, column-parallel qkv/gate-up, row-parallel o/down
followed by psum, KV cache sharded over kv heads, lm_head vocab-sharded
with an all_gather of the (tiny) logits.

Sharding layout decisions:
- wqkv / w_gate_up (column-parallel): the fused n_out axis is built
  shard-major — shard d's block is [q_d | k_d | v_d] (resp.
  [gate_d | up_d]) — so a plain P(None, 'tp') split hands every device
  exactly its heads and the in-shard-map split offsets are uniform.
- wo / w_down (row-parallel): input rows are padded to the planar block
  *per shard* and concatenated, so each local shard is a self-contained
  pair-planar layout; padded groups have scale = zs = 0.
- QTensorTPU aux (n_in, n_out) describes the PER-SHARD view, because the
  tensors are only ever consumed inside shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.io.checkpoint import RawCheckpoint, RawQWeight
from llama_cu_awq_tpu.models.llama import (
    KVCache,
    LlamaLayer,
    LlamaParams,
    forward,
)
from llama_cu_awq_tpu.parallel.mesh import DP_AXIS, TP_AXIS
from llama_cu_awq_tpu.quant.packing import (
    build_meta,
    out_pad,
    pad_cols,
    planar_pad,
    to_planar,
)
from llama_cu_awq_tpu.quant.qtensor import QTensorTPU


def _planarize(qw, zeros, scales, n_in, d_pad=None):
    d_pad = d_pad or out_pad(qw.shape[1])
    planar = pad_cols(to_planar(qw, n_in), d_pad)
    meta = build_meta(scales, zeros, n_in, d_pad)
    return planar, meta


def _col_shard_fused(raws: list[RawQWeight], tp: int) -> QTensorTPU:
    """Fused column-parallel tensor: n_out blocks ordered shard-major,
    each shard's local block column-padded so the split stays uniform."""
    n_in = raws[0].n_in
    n_out_local = sum(r.n_out for r in raws) // tp
    d_pad_local = out_pad(n_out_local)
    shards = []
    for d in range(tp):
        parts = []
        for r in raws:
            w = r.n_out // tp
            sl = slice(d * w, (d + 1) * w)
            parts.append((r.qw[:, sl], r.zeros[:, sl], r.scales[:, sl]))
        qw = np.concatenate([p[0] for p in parts], axis=1)
        zeros = np.concatenate([p[1] for p in parts], axis=1)
        scales = np.concatenate([p[2] for p in parts], axis=1)
        shards.append(_planarize(qw, zeros, scales, n_in, d_pad_local))
    return QTensorTPU(
        jnp.asarray(np.concatenate([s[0] for s in shards], axis=1)),
        jnp.asarray(np.concatenate([s[1] for s in shards], axis=1)),
        n_in, n_out_local)


def _row_shard(raw: RawQWeight, tp: int) -> QTensorTPU:
    """Row-parallel tensor: per-shard planar padding, shards concatenated
    along the packed-row axis."""
    from llama_cu_awq_tpu.quant.packing import GROUP_SIZE, pack_nibbles, unpack_nibbles

    n_local = raw.n_in // tp
    q_full = unpack_nibbles(raw.qw, raw.n_in)
    g_per = -(-n_local // GROUP_SIZE)
    planars, metas = [], []
    for d in range(tp):
        q_d = q_full[d * n_local:(d + 1) * n_local]
        z_d = raw.zeros[d * g_per:(d + 1) * g_per]
        s_d = raw.scales[d * g_per:(d + 1) * g_per]
        p, meta = _planarize(pack_nibbles(q_d), z_d, s_d, n_local)
        planars.append(p)
        metas.append(meta)
    return QTensorTPU(
        jnp.asarray(np.concatenate(planars, axis=0)),
        jnp.asarray(np.concatenate(metas, axis=0)),
        n_local, raw.n_out)


def _check_divisible(cfg: ModelConfig, tp: int):
    if cfg.n_kv_heads % tp or cfg.n_heads % tp:
        raise ValueError(f"tp={tp} must divide n_kv_heads={cfg.n_kv_heads}")
    if cfg.hidden_dim % tp or cfg.vocab_size % tp:
        raise ValueError(f"tp={tp} must divide hidden_dim and vocab_size")
    if (cfg.kv_dim // tp) % 128 and tp > 1:
        # groups must stay aligned for the per-shard quant layout
        raise ValueError("per-shard kv_dim must be a multiple of 128")


def tp_params_from_checkpoint(ckpt: RawCheckpoint, tp: int,
                              param_dtype=jnp.bfloat16) -> LlamaParams:
    """Host-side TP-layout params (unplaced); see module docstring."""
    _check_divisible(ckpt.config, tp)
    layers = [
        LlamaLayer(
            attn_norm=jnp.asarray(l.attn_norm, jnp.float32),
            ffn_norm=jnp.asarray(l.ffn_norm, jnp.float32),
            wqkv=_col_shard_fused([l.wq, l.wk, l.wv], tp),
            wo=_row_shard(l.wo, tp),
            w_gate_up=_col_shard_fused([l.w_gate, l.w_up], tp),
            w_down=_row_shard(l.w_down, tp),
        )
        for l in ckpt.layers
    ]
    return LlamaParams(
        embed=jnp.asarray(ckpt.embed, param_dtype),
        lm_head=jnp.asarray(ckpt.lm_head, param_dtype),
        final_norm=jnp.asarray(ckpt.final_norm, jnp.float32),
        layers=layers,
    )


def tp_param_shardings(cfg: ModelConfig, mesh) -> LlamaParams:
    """A LlamaParams-shaped pytree of NamedShardings.

    QTensorTPU aux fields carry the per-shard (n_in, n_out) so this tree
    has the same treedef as the actual params (pytree aux must match for
    tree.map / shard_map spec matching).
    """
    tp = mesh.shape[TP_AXIS]
    dim, kv, hid = cfg.dim, cfg.kv_dim, cfg.hidden_dim

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    def col(n_in, n_out_local):
        return QTensorTPU(ns(None, TP_AXIS), ns(None, TP_AXIS),
                          n_in, n_out_local)

    def row(n_in_local, n_out):
        return QTensorTPU(ns(TP_AXIS, None), ns(TP_AXIS, None),
                          n_in_local, n_out)

    layer = LlamaLayer(
        attn_norm=ns(None), ffn_norm=ns(None),
        wqkv=col(dim, (dim + 2 * kv) // tp),
        wo=row(dim // tp, dim),
        w_gate_up=col(dim, 2 * hid // tp),
        w_down=row(hid // tp, dim))
    return LlamaParams(embed=ns(None, None), lm_head=ns(TP_AXIS, None),
                       final_norm=ns(None),
                       layers=[layer for _ in range(cfg.n_layers)])


def place_params(params: LlamaParams, cfg: ModelConfig, mesh) -> LlamaParams:
    """device_put host-side TP params onto the mesh with their shardings."""
    sh = tp_param_shardings(cfg, mesh)
    p_leaves, p_def = jax.tree.flatten(params)
    s_leaves = jax.tree.leaves(sh)
    placed = [jax.device_put(x, s) for x, s in zip(p_leaves, s_leaves)]
    return jax.tree.unflatten(p_def, placed)


def tp_cache_sharding(mesh, batch_sharded: bool = False):
    spec = P(DP_AXIS if batch_sharded else None, None, TP_AXIS, None)
    return NamedSharding(mesh, spec)


def tp_init_kv_cache(cfg: ModelConfig, batch: int, max_seq: int, mesh,
                     dtype=jnp.bfloat16, batch_sharded: bool = False,
                     quantized: bool = False, kv_bits: int = 8):
    """KV cache sharded over kv heads (and optionally batch over dp).

    quantized: int8 codes + per-(slot, pos, head) f32 scales, the scales
    sharded over the same head axis as the codes (models/llama.py KVCache).
    kv_bits=4: nibble-packed codes (last dim head_dim//2) — the packing
    runs along head_dim, so the head-axis sharding is unchanged.
    """
    bspec = DP_AXIS if batch_sharded else None
    sharding = tp_cache_sharding(mesh, batch_sharded)
    s_sharding = NamedSharding(mesh, P(bspec, None, TP_AXIS))
    shape = (batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
    n = cfg.n_layers

    def zeros(shape, dtype, sh):
        return jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=sh)()

    if not quantized:
        return KVCache([zeros(shape, dtype, sharding) for _ in range(n)],
                       [zeros(shape, dtype, sharding) for _ in range(n)])
    sshape = shape[:-1]
    if kv_bits == 4:
        shape = shape[:-1] + (cfg.head_dim // 2,)
    elif kv_bits != 8:
        raise ValueError(f"kv_bits must be 4 or 8, got {kv_bits}")
    return KVCache(
        [zeros(shape, jnp.int8, sharding) for _ in range(n)],
        [zeros(shape, jnp.int8, sharding) for _ in range(n)],
        [zeros(sshape, jnp.float32, s_sharding) for _ in range(n)],
        [zeros(sshape, jnp.float32, s_sharding) for _ in range(n)])


def tp_synthetic_params(cfg: ModelConfig, mesh, seed: int = 0,
                        param_dtype=jnp.bfloat16) -> LlamaParams:
    """Random TP-layout params placed on the mesh (benchmarks/dryrun)."""
    from llama_cu_awq_tpu.models.llama import synthetic_params

    tp = mesh.shape[TP_AXIS]
    _check_divisible(cfg, tp)
    # build per-shard shapes directly: reuse synthetic_params on a config
    # view is awkward (fused layouts), so synthesize global arrays with
    # the right per-shard geometry and place them.
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 2 + cfg.n_layers)
    dim, kv, hid, vocab = cfg.dim, cfg.kv_dim, cfg.hidden_dim, cfg.vocab_size
    sh = tp_param_shardings(cfg, mesh)

    def q(key, n_local, n_out_local, tp_mult, sharding, col):
        """col: global d = out_pad(n_out_local)*tp, rows = local planar;
        row: global rows = tp*local planar rows, d = out_pad(n_out)."""
        k1, k2 = jax.random.split(key)
        n_pad = planar_pad(n_local)
        g_pad, g = n_pad // 128, -(-n_local // 128)
        d_pad_local = out_pad(n_out_local)
        if col:
            rows, gr, d_tot = n_pad // 8, g_pad, d_pad_local * tp_mult
        else:
            rows, gr, d_tot = (n_pad // 8) * tp_mult, g_pad * tp_mult, \
                d_pad_local
        qw = jax.device_put(
            jax.random.bits(k1, (rows, d_tot), jnp.uint32), sharding.qw)
        scales = 0.01 * (1.0 + 0.1 * jax.random.normal(
            k2, (gr, d_tot), jnp.float32))
        # zero padded group rows (padded cols are sliced off downstream)
        valid = (jnp.arange(g_pad) < g)
        mask = jnp.tile(valid, gr // g_pad)[:, None]
        scales = jnp.where(mask, scales, 0.0)
        z128 = jnp.full((gr, d_tot), 8.0 + 128.0)
        meta = jnp.stack([scales, z128], axis=1).astype(
            jnp.bfloat16).reshape(2 * gr, d_tot)
        meta = jax.device_put(meta, sharding.meta)
        return QTensorTPU(qw, meta, n_local, n_out_local)

    def layer(key, lsh):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return LlamaLayer(
            attn_norm=jnp.ones((dim,), jnp.float32),
            ffn_norm=jnp.ones((dim,), jnp.float32),
            wqkv=q(k1, dim, (dim + 2 * kv) // tp, tp, lsh.wqkv, True),
            wo=q(k2, dim // tp, dim, tp, lsh.wo, False),
            w_gate_up=q(k3, dim, 2 * hid // tp, tp, lsh.w_gate_up, True),
            w_down=q(k4, hid // tp, dim, tp, lsh.w_down, False),
        )

    return LlamaParams(
        embed=jax.device_put(
            jax.random.normal(ks[0], (vocab, dim), param_dtype) * 0.02,
            sh.embed),
        lm_head=jax.device_put(
            jax.random.normal(ks[1], (vocab, dim), param_dtype) * 0.02,
            sh.lm_head),
        final_norm=jnp.ones((dim,), jnp.float32),
        layers=[layer(ks[2 + i], sh.layers[i])
                for i in range(cfg.n_layers)],
    )


def make_shard_forward(cfg: ModelConfig, mesh, *,
                       batch_sharded: bool = False):
    """A drop-in replacement for models.llama.forward (minus the cfg
    argument) that runs the local per-shard forward under jax.shard_map
    over the (dp, tp) mesh: column/row-parallel packed matmuls with psum,
    kv-head-sharded cache, vocab-sharded lm_head with all_gather.

    The returned callable is trace-time polymorphic (attn_len /
    logits_all / no_logits / quantized-cache are Python-level), so the
    engines can close over it inside their jitted step functions exactly
    where they would call `forward` (engine/engine.py, engine/batch.py).
    """
    tp = mesh.shape[TP_AXIS]
    bspec = DP_AXIS if batch_sharded else None
    params_spec = jax.tree.map(
        lambda s: s.spec, tp_param_shardings(cfg, mesh),
        is_leaf=lambda x: isinstance(x, NamedSharding))
    n = cfg.n_layers
    kv_spec = P(bspec, None, TP_AXIS, None)
    kvs_spec = P(bspec, None, TP_AXIS)

    def fwd(params, tokens, pos, cache, *, attn_len=None,
            act_dtype=jnp.bfloat16, matmul_impl=None, attn_impl=None,
            logits_all=False, no_logits=False):
        cache_specs = (
            KVCache([kv_spec] * n, [kv_spec] * n,
                    [kvs_spec] * n, [kvs_spec] * n)
            if cache.quantized else KVCache([kv_spec] * n, [kv_spec] * n))
        logits_spec = (None if no_logits else
                       P(bspec, None, None) if logits_all else
                       P(bspec, None))

        def local_forward(params, tokens, pos, cache):
            return forward(params, cfg, tokens, pos, cache,
                           attn_len=attn_len, act_dtype=act_dtype,
                           matmul_impl=matmul_impl, attn_impl=attn_impl,
                           logits_all=logits_all, no_logits=no_logits,
                           tp_axis=TP_AXIS, tp_size=tp)

        return jax.shard_map(
            local_forward,
            mesh=mesh,
            in_specs=(params_spec, P(bspec, None), P(bspec), cache_specs),
            out_specs=(logits_spec, cache_specs),
            check_vma=False,
        )(params, tokens, pos, cache)

    return fwd


def make_tp_forward(cfg: ModelConfig, mesh, *, attn_len: int,
                    act_dtype=jnp.bfloat16, matmul_impl: str | None = None,
                    logits_all: bool = False, batch_sharded: bool = False):
    """Jitted shard_map forward over the (dp, tp) mesh at a fixed
    attention window (standalone use; the engines use make_shard_forward
    inside their own jitted step functions)."""
    sf = make_shard_forward(cfg, mesh, batch_sharded=batch_sharded)

    def fn(params, tokens, pos, cache):
        return sf(params, tokens, pos, cache, attn_len=attn_len,
                  act_dtype=act_dtype, matmul_impl=matmul_impl,
                  logits_all=logits_all)

    return jax.jit(fn, donate_argnums=(3,))
