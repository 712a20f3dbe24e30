import numpy as np
import pytest

from llama_cu_awq_tpu.config import GROUP_SIZE
from llama_cu_awq_tpu.quant import packing


def test_pack_unpack_roundtrip(rng):
    q = rng.integers(0, 16, size=(384, 24), dtype=np.int32)
    packed = packing.pack_nibbles(q)
    assert packed.dtype == np.uint32
    assert packed.shape == (48, 24)
    assert np.array_equal(packing.unpack_nibbles(packed, 384), q)


def test_pack_partial_rows(rng):
    q = rng.integers(0, 16, size=(20, 8), dtype=np.int32)
    packed = packing.pack_nibbles(q)
    assert packed.shape == (3, 8)
    assert np.array_equal(packing.unpack_nibbles(packed, 20), q)


def test_file_mem_roundtrip(rng):
    n, d = 256, 40
    q = rng.integers(0, 16, size=(n, d), dtype=np.int32)
    qw = packing.pack_nibbles(q)
    file_arr = packing.qweight_mem_to_file(qw, n)
    # file layout is padded to divUp(n,32)*4 words (llama2_q4.cu:82-88)
    assert file_arr.shape == (d, packing.packed_weight_height(n))
    back = packing.qweight_file_to_mem(file_arr, n)
    assert np.array_equal(back, qw)


def test_zeros_scales_file_roundtrip(rng):
    n, d = 11008, 16  # 86 groups: exercises zero-padding to multiple of 8
    g = packing.div_up(n, GROUP_SIZE)
    zeros = rng.integers(0, 16, size=(g, d), dtype=np.int8)
    scales = rng.random((g, d), dtype=np.float32).astype(np.float16)

    zf = packing.zeros_mem_to_file(zeros)
    assert zf.shape == (d, packing.div_up(g, 8))
    assert np.array_equal(packing.zeros_file_to_mem(zf, n), zeros)

    sf = packing.scales_mem_to_file(scales.astype(np.float32))
    assert sf.dtype == np.float16
    back = packing.scales_file_to_mem(sf)
    assert np.array_equal(back, scales.astype(np.float32))


def test_quantize_dequantize_close(rng):
    n, d = 384, 48
    w = rng.standard_normal((n, d), dtype=np.float32) * 0.1
    qw, zeros, scales = packing.quantize_np(w)
    wd = packing.dequantize_np(qw, zeros, scales, n)
    # max error bounded by scale/2 per element
    max_scale = scales.max()
    assert np.max(np.abs(wd - w)) <= max_scale * 0.75


def test_dequantize_exact_formula(rng):
    n, d = 200, 8  # partial last group
    g = packing.div_up(n, GROUP_SIZE)
    q = rng.integers(0, 16, size=(n, d), dtype=np.int32)
    zeros = rng.integers(0, 16, size=(g, d), dtype=np.int8)
    scales = rng.random((g, d), dtype=np.float32).astype(np.float16).astype(np.float32)
    wd = packing.dequantize_np(packing.pack_nibbles(q), zeros, scales, n)
    for y in (0, 5, 127, 128, 199):
        for x in (0, 7):
            expect = (float(q[y, x]) - float(zeros[y // 128, x])) * scales[y // 128, x]
            assert wd[y, x] == pytest.approx(expect, abs=0)


def test_awq_old_format_repack(rng):
    """Old-format interleaved AWQ tensors repack to the canonical layout
    (reference: weight_packer.cpp:94-127)."""
    h, w = 256, 32
    q = rng.integers(0, 16, size=(h, w), dtype=np.uint32)
    # build the interleaved row-major packing the AWQ repo emits
    order_map = [0, 2, 4, 6, 1, 3, 5, 7]
    packed = np.zeros((h, w // 8), dtype=np.uint32)
    for y in range(h):
        for x8 in range(w // 8):
            word = np.uint32(0)
            for j in range(8):
                word |= q[y, x8 * 8 + order_map[j]] << np.uint32(4 * j)
            packed[y, x8] = word
    out = packing.awq_unpack_interleaved(packed, h, w)
    assert np.array_equal(out, q.astype(np.int32))
