"""AWQ w4-g128 packing/unpacking numerics (NumPy, offline/load-time).

The checkpoint `.bin` stores each quantized tensor as three sections in the
layout produced by the reference weight packer (weight_packer.cpp:94-144)
and consumed by its loader (llama2_q4.cu:82-98,162-170):

For a logical weight W of shape (n_in, n_out) with out = x @ W
("height" = n_in = inputElements, "width" = n_out = opElements in the
reference), group size 128 along n_in:

  qweight: uint32[width, packed_wt_height], packed_wt_height = ceil(n/32)*4.
           Word [x, y8] packs rows 8*y8 .. 8*y8+7 of column x, 4 bits each,
           little-endian nibbles (nibble i = row 8*y8+i). Rows beyond
           ceil(n/8) words are alignment padding (for the reference's
           uint4 vector loads, llama2_q4.cu:82-88).
  qzeros:  uint32[width, ceil(g/8)] with g = ceil(n/128) groups; nibble i of
           word [x, yg8] is the zero-point of group 8*yg8+i of column x.
  scales:  float16[width, g]; [x, yg] is the scale of group yg of column x.

Dequantization: w[y, x] = (q[y, x] - zero[y//128, x]) * scale[y//128, x]
(reference: gpu_kernels.h:171-210).

In-memory (TPU-side) we use the transposed, unpadded layout with the
lane (last, 128-wide) dimension on n_out:

  qw:     uint32[ceil(n/8), n_out]   nibble-packed as above
  zeros:  int8  [g, n_out]
  scales: float32[g, n_out]          (fp16 values, exactly widened)
"""

from __future__ import annotations

import numpy as np

from llama_cu_awq_tpu.config import GROUP_SIZE


def div_up(a: int, b: int) -> int:
    return -(-a // b)


def packed_weight_height(n: int) -> int:
    """File-layout padded packed height (reference: llama2_q4.cu:82-88)."""
    return div_up(n, 32) * 4


def pack_nibbles(q: np.ndarray) -> np.ndarray:
    """Pack int values 0..15 of shape (n, d) into uint32 (ceil(n/8), d).

    Nibble i (little-endian) of word y holds row 8*y + i.
    """
    n, d = q.shape
    rows = div_up(n, 8) * 8
    qp = np.zeros((rows, d), dtype=np.uint32)
    qp[:n] = q.astype(np.uint32) & 0xF
    qp = qp.reshape(rows // 8, 8, d)
    shifts = (4 * np.arange(8, dtype=np.uint32)).reshape(1, 8, 1)
    return np.bitwise_or.reduce(qp << shifts, axis=1).astype(np.uint32)


def unpack_nibbles(packed: np.ndarray, n: int) -> np.ndarray:
    """Inverse of pack_nibbles: uint32 (ceil(n/8), d) -> int8 (n, d)."""
    nw, d = packed.shape
    shifts = (4 * np.arange(8, dtype=np.uint32)).reshape(1, 8, 1)
    vals = (packed.reshape(nw, 1, d) >> shifts) & np.uint32(0xF)
    return vals.reshape(nw * 8, d)[:n].astype(np.int8)


# ---------------------------------------------------------------------------
# file layout <-> in-memory layout

def qweight_file_to_mem(qw_file: np.ndarray, n: int) -> np.ndarray:
    """uint32 (width, packed_wt_height) -> uint32 (ceil(n/8), width)."""
    return np.ascontiguousarray(qw_file[:, : div_up(n, 8)].T)


def qweight_mem_to_file(qw: np.ndarray, n: int) -> np.ndarray:
    nw, width = qw.shape
    out = np.zeros((width, packed_weight_height(n)), dtype=np.uint32)
    out[:, :nw] = qw.T
    return out


def zeros_file_to_mem(qz_file: np.ndarray, n: int) -> np.ndarray:
    """uint32 (width, ceil(g/8)) -> int8 (g, width)."""
    g = div_up(n, GROUP_SIZE)
    return unpack_nibbles(np.ascontiguousarray(qz_file.T), g)


def zeros_mem_to_file(zeros: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(pack_nibbles(zeros).T)


def scales_file_to_mem(s_file: np.ndarray) -> np.ndarray:
    """float16 (width, g) -> float32 (g, width) (exact widening)."""
    return s_file.T.astype(np.float32)


def scales_mem_to_file(scales: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(scales.T.astype(np.float16))


# ---------------------------------------------------------------------------

def dequantize_np(qw: np.ndarray, zeros: np.ndarray, scales: np.ndarray,
                  n: int) -> np.ndarray:
    """Exact f32 dequantization of the in-memory layout -> (n, width).

    w = (q - z) * s, computed per element in float32 exactly as the
    reference kernel does (gpu_kernels.h:196-197).
    """
    q = unpack_nibbles(qw, n).astype(np.float32)
    gidx = np.arange(n) // GROUP_SIZE
    z = zeros.astype(np.float32)[gidx]
    s = scales.astype(np.float32)[gidx]
    return (q - z) * s


# ---------------------------------------------------------------------------
# TPU kernel ("pair-planar") layout.
#
# The Pallas int4 matmul consumes chunks of PLANAR_BLOCK=512 input rows
# (64 packed words). Within a chunk, nibble pair (p, p+4) of word row y
# (0 <= y < 64) holds logical rows chunk*512 + p*128 + 2y and ... + 2y+1.
# Why: bits 4p and 4p+16 are exactly 16 apart, so ONE shift+mask
# (w >> 4p) & 0x000F000F extracts both nibbles into the two 16-bit
# halves of the word; OR-ing 0x4300_4300 turns each half into the bf16
# bit pattern of (128 + q) (exact: 128+q needs 8 mantissa bits, bf16 has
# 8); a free bitcast u32(64,d) -> bf16(128,d) then lands the two rows in
# hardware-interleaved order (row 2y = low half, 2y+1 = high half) —
# which this layout makes exactly one contiguous 128-row quantization
# group. Per pair-plane the kernel does just 3 VPU ops (shift, and, or)
# for 2 weights, then one MXU dot:
#   out += (x_g @ (q_g + 128)) * s_g - sum(x_g) * ((z_g + 128) * s_g)
# == sum x*(q-z)*s exactly (algebraically; f32 accumulation).

PLANAR_BLOCK = 512  # 4 nibble-pair planes x 128-row groups
_PAIR_BIAS = 128    # folded into the zero term: zs = (z + 128) * s


def planar_pad(n: int) -> int:
    # pad to an EVEN number of 512-row chunks: the kernel needs an even
    # chunks-per-step for bf16 meta sublane alignment, and an odd total
    # would force a whole-array block (VMEM overflow at 13B's
    # hidden_dim 13824 = 27 chunks)
    return div_up(n, 2 * PLANAR_BLOCK) * 2 * PLANAR_BLOCK


def out_pad(d: int) -> int:
    """Pad the n_out (lane) dimension to a multiple of 1024 so the kernel
    gets >= 1024-wide tiles (swept as fast on v5e) without coarse-grain
    padding waste — 2048-granularity would inflate 13B's 5120-wide
    projections by 20%. Padded columns carry scale 0. Small tensors only
    pad to the 128-lane minimum."""
    return div_up(d, 1024) * 1024 if d >= 1024 else div_up(d, 128) * 128


def pad_cols(arr: np.ndarray, d_pad: int) -> np.ndarray:
    if arr.shape[-1] == d_pad:
        return arr
    out = np.zeros(arr.shape[:-1] + (d_pad,), dtype=arr.dtype)
    out[..., : arr.shape[-1]] = arr
    return out


def to_planar(qw: np.ndarray, n: int) -> np.ndarray:
    """Canonical packed (ceil(n/8), d) -> pair-planar packed (n_pad/8, d)."""
    d = qw.shape[1]
    q = np.zeros((planar_pad(n), d), dtype=np.uint32)
    q[:n] = unpack_nibbles(qw, n).astype(np.uint32)
    c = planar_pad(n) // PLANAR_BLOCK
    # q[c, p, y, h, d]: chunk, pair-plane, word row, half
    q = q.reshape(c, 4, 64, 2, d)
    words = np.zeros((c, 64, d), dtype=np.uint32)
    for p in range(4):
        words |= q[:, p, :, 0, :] << np.uint32(4 * p)         # nibble p
        words |= q[:, p, :, 1, :] << np.uint32(4 * p + 16)    # nibble p+4
    return words.reshape(c * 64, d)


def from_planar(qw_planar: np.ndarray, n: int) -> np.ndarray:
    """Pair-planar packed (n_pad/8, d) -> unpacked int8 (n, d)."""
    rows, d = qw_planar.shape
    c = rows // 64
    w = qw_planar.reshape(c, 64, d)
    out = np.empty((c, 4, 64, 2, d), dtype=np.int8)
    for p in range(4):
        out[:, p, :, 0, :] = (w >> np.uint32(4 * p)) & 0xF
        out[:, p, :, 1, :] = (w >> np.uint32(4 * p + 16)) & 0xF
    return out.reshape(c * PLANAR_BLOCK, d)[:n]


def pad_group_rows(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad per-group metadata (g, d) to planar group count (n_pad/128, d)."""
    g_pad = planar_pad(n) // GROUP_SIZE
    out = np.zeros((g_pad,) + arr.shape[1:], dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def build_meta(scales: np.ndarray, zeros: np.ndarray, n: int,
               d_pad: int) -> np.ndarray:
    """Interleaved bf16 quant metadata for the kernel layout.

    Returns (2 * n_pad/128, d_pad) bfloat16 with row 2i = scale of group i
    and row 2i+1 = zero_i + 128 (bf16-EXACT: an integer in [128, 143]).
    The kernel computes (x@(q+128) - sum(x)*(z+128)) * s, so the bf16
    rounding of the scale is purely multiplicative on the dequantized
    weight (<= 2^-8 relative — below AWQ's own 4-bit quantization error),
    while the large (q+128)/(z+128) terms still cancel exactly in f32.
    Padding rows/cols carry scale 0 so they contribute nothing. Halves
    the metadata HBM traffic vs f32 (scale, zs) pairs — metadata is ~6%
    of the per-token weight stream at 7B.
    """
    import ml_dtypes

    g_pad = planar_pad(n) // GROUP_SIZE
    s = pad_cols(pad_group_rows(np.asarray(scales, np.float32), n), d_pad)
    z128 = pad_cols(pad_group_rows(
        np.asarray(zeros, np.float32) + float(_PAIR_BIAS), n), d_pad)
    meta = np.empty((g_pad, 2, d_pad), dtype=ml_dtypes.bfloat16)
    meta[:, 0, :] = s.astype(ml_dtypes.bfloat16)
    meta[:, 1, :] = z128.astype(ml_dtypes.bfloat16)
    return meta.reshape(2 * g_pad, d_pad)


def quantize_np(w: np.ndarray, group_size: int = GROUP_SIZE):
    """Simple AWQ-style asymmetric w4 quantizer (for tests & synthetic models).

    Returns (qw_mem uint32, zeros int8 (g,d), scales f32 (g,d)) such that
    dequantize_np() approximates w (n, d).
    """
    n, d = w.shape
    g = div_up(n, group_size)
    q = np.zeros((n, d), dtype=np.int32)
    zeros = np.zeros((g, d), dtype=np.int8)
    scales = np.zeros((g, d), dtype=np.float32)
    for gi in range(g):
        sl = slice(gi * group_size, min((gi + 1) * group_size, n))
        wg = w[sl]
        wmin, wmax = wg.min(axis=0), wg.max(axis=0)
        scale = np.maximum((wmax - wmin) / 15.0, 1e-8).astype(np.float16)
        zero = np.clip(np.round(-wmin / scale.astype(np.float32)), 0, 15)
        scales[gi] = scale.astype(np.float32)
        zeros[gi] = zero.astype(np.int8)
        q[sl] = np.clip(
            np.round(wg / scale.astype(np.float32) + zero), 0, 15
        ).astype(np.int32)
    return pack_nibbles(q), zeros, scales


# ---------------------------------------------------------------------------
# AWQ original-format repacking (offline pipeline; reference:
# weight_packer.cpp:94-127). The original AWQ export packs 8 elements along
# the *output* (width) dimension per uint32, interleaved with
# order_map = {0, 2, 4, 6, 1, 3, 5, 7}, in row-major (height, width/8).

_AWQ_ORDER_MAP = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def awq_pack_interleaved(vals: np.ndarray) -> np.ndarray:
    """int (h, w) 0..15 -> uint32 (h, w//8) with AWQ's order_map nibble
    interleave (inverse of awq_unpack_interleaved; the export direction,
    used to emit original-format AWQ dumps from locally quantized
    weights, e.g. tools/train_tiny.py)."""
    h, w = vals.shape
    v = vals.reshape(h, w // 8, 8).astype(np.uint32)
    v = v[:, :, _AWQ_ORDER_MAP]  # nibble j holds column order_map[j]
    shifts = (4 * np.arange(8, dtype=np.uint32)).reshape(1, 1, 8)
    return np.bitwise_or.reduce(v << shifts, axis=2)


def awq_unpack_interleaved(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    """uint32 (height, width//8) AWQ-ordered -> int32 (height, width) values."""
    shifts = (4 * np.arange(8, dtype=np.uint32)).reshape(1, 1, 8)
    vals = (arr.reshape(height, width // 8, 1) >> shifts) & np.uint32(0xF)
    # nibble j (shift position j) belongs to logical column order_map[j]
    out = np.empty((height, width // 8, 8), dtype=np.int32)
    out[:, :, _AWQ_ORDER_MAP] = vals.astype(np.int32)
    return out.reshape(height, width)


def repack_awq_old_format(qweight: np.ndarray, qzeros: np.ndarray,
                          scales: np.ndarray, height: int, width: int):
    """Old-format AWQ tensors -> in-memory layout (qw, zeros, scales).

    qweight: uint32 (height, width//8) interleaved; qzeros: uint32
    (ceil(height/128), width//8) interleaved; scales: fp16 (g, width).
    """
    q = awq_unpack_interleaved(qweight, height, width)
    g = div_up(height, GROUP_SIZE)
    z = awq_unpack_interleaved(qzeros, g, width)
    return (
        pack_nibbles(q),
        z.astype(np.int8),
        scales.astype(np.float32),
    )
