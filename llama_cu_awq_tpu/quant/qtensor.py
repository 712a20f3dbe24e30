"""QTensor: a packed w4-g128 quantized weight as a JAX pytree.

The TPU-resident analog of the reference's `QWeight{weight, zeros, scales}`
(reference: common.h:20-24), but laid out lane-friendly for Pallas/XLA:
the 128-element lane dimension is n_out, and the nibble-packed rows sit on
the sublane dimension. Weights stay 4-bit in HBM; dequantization happens
on the fly in the compute kernels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from llama_cu_awq_tpu.config import GROUP_SIZE
from llama_cu_awq_tpu.quant import packing


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """Packed 4-bit weight of logical shape (n_in, n_out); out = x @ W.

    qw:     uint32 (ceil(n_in/8), n_out) — 8 input-rows per word
    zeros:  int8   (ceil(n_in/128), n_out)
    scales: float32(ceil(n_in/128), n_out)
    """

    qw: jax.Array
    zeros: jax.Array
    scales: jax.Array
    n_in: int
    n_out: int

    def tree_flatten(self):
        return (self.qw, self.zeros, self.scales), (self.n_in, self.n_out)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.n_in, self.n_out)

    @property
    def n_groups(self) -> int:
        return packing.div_up(self.n_in, GROUP_SIZE)

    @classmethod
    def from_numpy(cls, qw: np.ndarray, zeros: np.ndarray, scales: np.ndarray,
                   n_in: int) -> "QTensor":
        return cls(jnp.asarray(qw), jnp.asarray(zeros),
                   jnp.asarray(scales), n_in, qw.shape[1])

    @classmethod
    def quantize(cls, w: np.ndarray) -> "QTensor":
        """Quantize a dense f32 weight (tests / synthetic models)."""
        qw, zeros, scales = packing.quantize_np(np.asarray(w, np.float32))
        return cls.from_numpy(qw, zeros, scales, w.shape[0])

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Dense (n_in, n_out) weight; (q - z) * s in f32, then cast.

        The plain-JAX oracle path (the role the SYCL CPU backend plays for
        the reference, sycl/README.md:3); kernels fuse this on the fly.
        """
        return dequant_expand(self.qw, self.zeros, self.scales,
                              self.n_in).astype(dtype)


def dequant_expand(qw: jax.Array, zeros: jax.Array, scales: jax.Array,
                   n_in: int) -> jax.Array:
    """jnp dequantization of the packed layout -> f32 (n_in, n_out).

    Matches gpu_kernels.h:196-197 numerics exactly: q, z are small ints and
    s is an fp16-representable value, so (q - z) * s is exact in f32.
    """
    nw, d = qw.shape
    shifts = (4 * jnp.arange(8, dtype=jnp.uint32))[None, :, None]
    q = ((qw[:, None, :] >> shifts) & jnp.uint32(0xF)).astype(jnp.float32)
    q = q.reshape(nw * 8, d)[:n_in]
    gidx = jnp.arange(n_in) // GROUP_SIZE
    z = zeros.astype(jnp.float32)[gidx]
    s = scales[gidx]
    return (q - z) * s


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensorTPU:
    """Packed 4-bit weight in the TPU kernel ("planar") layout.

    qw:   uint32 (n_pad/8, d_pad) — see packing.to_planar (pair-planar)
    meta: bfloat16 (2 * n_pad/128, d_pad) — interleaved per-group
          metadata (packing.build_meta): row 2i = scale of group i,
          row 2i+1 = zero_i + 128 (bf16-exact; the +128 cancels the
          kernel's bf16 exponent-bias unpack trick)

    n_pad pads input rows to the 512-row planar block; d_pad pads output
    columns to the kernel's preferred lane tile (packing.out_pad).
    Padding rows/columns carry scale 0, so they contribute nothing; the
    matmul wrapper slices the output back to n_out.
    """

    qw: jax.Array
    meta: jax.Array
    n_in: int
    n_out: int

    def tree_flatten(self):
        return (self.qw, self.meta), (self.n_in, self.n_out)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.n_in, self.n_out)

    @property
    def n_pad(self) -> int:
        return self.qw.shape[-2] * 8

    @property
    def d_pad(self) -> int:
        return self.qw.shape[-1]

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Dense (n_in, n_out) weight from the pair-planar layout
        (oracle/CPU fallback path): w = ((q+128) - (z+128)) * s with the
        kernel's exact metadata (bf16 scale -> f32)."""
        rows, d = self.qw.shape[-2], self.qw.shape[-1]
        c = rows // 64
        w = self.qw.reshape(c, 1, 64, 1, d)
        shifts = (4 * jnp.arange(4, dtype=jnp.uint32)).reshape(1, 4, 1, 1, 1)
        halves = jnp.concatenate(
            [(w >> shifts) & jnp.uint32(0xF),
             (w >> (shifts + 16)) & jnp.uint32(0xF)], axis=3)
        q = halves.astype(jnp.float32).reshape(c * 4 * 64 * 2, d)[: self.n_in]
        gidx = jnp.arange(self.n_in) // GROUP_SIZE
        meta = self.meta.astype(jnp.float32).reshape(-1, 2, d)
        s, z128 = meta[gidx, 0], meta[gidx, 1]
        dense = ((q + 128.0) - z128) * s
        return dense[:, : self.n_out].astype(dtype)


def to_tpu_layout(qt: QTensor) -> QTensorTPU:
    """Repack a canonical QTensor into the planar kernel layout (host)."""
    qw = np.asarray(qt.qw)
    d_pad = packing.out_pad(qt.n_out)
    planar = packing.pad_cols(packing.to_planar(qw, qt.n_in), d_pad)
    meta = packing.build_meta(np.asarray(qt.scales), np.asarray(qt.zeros),
                              qt.n_in, d_pad)
    return QTensorTPU(jnp.asarray(planar), jnp.asarray(meta),
                      qt.n_in, qt.n_out)


def concat_qtensors(tensors: list[QTensor]) -> QTensor:
    """Concatenate along n_out (fused qkv / gate-up layouts).

    The TPU-native analog of the reference's fused qkv_matvec_kernel and
    ffn_matvec_silu_kernel (gpu_kernels.h:242-275): one packed matmul over
    the concatenated output dimension replaces multiple kernel launches.
    """
    n_in = tensors[0].n_in
    assert all(t.n_in == n_in for t in tensors)
    return QTensor(
        jnp.concatenate([t.qw for t in tensors], axis=1),
        jnp.concatenate([t.zeros for t in tensors], axis=1),
        jnp.concatenate([t.scales for t in tensors], axis=1),
        n_in,
        sum(t.n_out for t in tensors),
    )


def stack_qtensors(tensors: list[QTensor]) -> QTensor:
    """Stack per-layer QTensors along a new leading axis (for lax.scan)."""
    t0 = tensors[0]
    return QTensor(
        jnp.stack([t.qw for t in tensors]),
        jnp.stack([t.zeros for t in tensors]),
        jnp.stack([t.scales for t in tensors]),
        t0.n_in,
        t0.n_out,
    )


def index_qtensor(qt: QTensor, i) -> QTensor:
    """Select layer i from a stacked QTensor (inside lax.scan)."""
    return QTensor(qt.qw[i], qt.zeros[i], qt.scales[i], qt.n_in, qt.n_out)
