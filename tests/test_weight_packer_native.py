"""Offline pipeline tests: the native C++ weight_packer must be
byte-identical to the Python oracle (tools/pack_weights.py path), and the
direct safetensors loader must round-trip.

Covers the reference pipeline stage 2 (weight_packer.cpp:94-297): old-
format AWQ de-interleave/transpose/repack and new-format scale stripping.
"""

import json
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from llama_cu_awq_tpu.config import GROUP_SIZE, ModelConfig
from llama_cu_awq_tpu.io import awq
from llama_cu_awq_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from llama_cu_awq_tpu.quant import packing

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

awq_pack_interleaved = packing.awq_pack_interleaved


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig(dim=64, hidden_dim=160, n_layers=2, n_heads=4,
                       n_kv_heads=2, vocab_size=96, seq_len=128,
                       rope_theta=50000.0)


def make_hf_config(cfg: ModelConfig) -> str:
    return json.dumps({
        "hidden_size": cfg.dim, "intermediate_size": cfg.hidden_dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.seq_len,
        "rope_theta": cfg.rope_theta,
    })


def make_awq_tensors(cfg: ModelConfig, rng, old_format: bool):
    """Synthetic HF-AWQ tensor dict (the converter's output contract)."""
    tensors = {}

    def fp16(shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float16)

    tensors["model.embed_tokens.weight"] = fp16((cfg.vocab_size, cfg.dim))
    tensors["lm_head.weight"] = fp16((cfg.vocab_size, cfg.dim))
    tensors["model.norm.weight"] = fp16((cfg.dim,))
    for i in range(cfg.n_layers):
        base = f"model.layers.{i}."
        for name in awq._QUANT_NAMES:
            n_in, n_out = awq._tensor_dims(cfg, name)
            g = packing.div_up(n_in, GROUP_SIZE)
            q = rng.integers(0, 16, size=(n_in, n_out))
            z = rng.integers(0, 16, size=(g, n_out))
            s = (rng.random((g, n_out)) * 0.01 + 1e-4).astype(np.float16)
            if old_format:
                tensors[base + name + ".qweight"] = \
                    awq_pack_interleaved(q).view(np.int32)
                tensors[base + name + ".qzeros"] = \
                    awq_pack_interleaved(z).view(np.int32)
                tensors[base + name + ".scales"] = s
            else:
                qw = packing.pack_nibbles(q)
                tensors[base + name + ".qweight"] = \
                    packing.qweight_mem_to_file(qw, n_in)[
                        :, : packing.div_up(n_in, 8)].view(np.int32)
                tensors[base + name + ".qzeros"] = \
                    packing.zeros_mem_to_file(z.astype(np.int8)).view(np.int32)
                padded_g = packing.div_up(g, 8) * 8
                sp = np.zeros((n_out, padded_g), np.float16)
                sp[:, :g] = s.T
                tensors[base + name + ".scales"] = sp
        tensors[base + "input_layernorm.weight"] = fp16((cfg.dim,))
        tensors[base + "post_attention_layernorm.weight"] = fp16((cfg.dim,))
    return tensors


def dump_tensors(tensors, outdir):
    os.makedirs(outdir, exist_ok=True)
    for name, value in tensors.items():
        with open(os.path.join(outdir, name + ".bin"), "wb") as f:
            f.write(value.tobytes())


@pytest.fixture(scope="session")
def packer_bin(tmp_path_factory):
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no C++ toolchain")
    out = tmp_path_factory.mktemp("native") / "weight_packer"
    src = os.path.join(REPO, "native", "weight_packer.cpp")
    subprocess.run([gxx, "-O2", "-std=c++17", "-o", str(out), src],
                   check=True)
    return str(out)


@pytest.mark.parametrize("old_format", [True, False])
def test_cpp_packer_matches_python_oracle(tmp_path, rng, tiny_cfg,
                                          packer_bin, old_format):
    tensors = make_awq_tensors(tiny_cfg, rng, old_format)
    dump_dir = tmp_path / "dump"
    dump_tensors(tensors, dump_dir)
    config_path = tmp_path / "config.json"
    config_path.write_text(make_hf_config(tiny_cfg))

    # Python oracle
    ckpt = awq.checkpoint_from_dump_dir(str(dump_dir), str(config_path),
                                        old_format=old_format)
    py_bin = tmp_path / "py.bin"
    save_checkpoint(str(py_bin), ckpt)

    # native packer
    cpp_bin = tmp_path / "cpp.bin"
    subprocess.run([packer_bin, str(config_path), str(dump_dir),
                    str(cpp_bin), str(int(old_format))], check=True,
                   capture_output=True)

    assert py_bin.read_bytes() == cpp_bin.read_bytes()


def test_packed_bin_roundtrip_dequant(tmp_path, rng, tiny_cfg):
    """Values survive AWQ interleave -> .bin -> loader -> dequant."""
    tensors = make_awq_tensors(tiny_cfg, rng, old_format=True)
    ckpt = awq.checkpoint_from_tensors(tensors, tiny_cfg, old_format=True)
    path = tmp_path / "m.bin"
    save_checkpoint(str(path), ckpt)
    loaded = load_checkpoint(str(path))

    qt = loaded.layers[0].wq
    w = packing.dequantize_np(qt.qw, qt.zeros, qt.scales, qt.n_in)
    # reconstruct expected from the synthetic AWQ source
    src_q = packing.awq_unpack_interleaved(
        tensors["model.layers.0.self_attn.q_proj.qweight"].view(np.uint32),
        tiny_cfg.dim, tiny_cfg.dim)
    src_z = packing.awq_unpack_interleaved(
        tensors["model.layers.0.self_attn.q_proj.qzeros"].view(np.uint32),
        packing.div_up(tiny_cfg.dim, GROUP_SIZE), tiny_cfg.dim)
    src_s = tensors["model.layers.0.self_attn.q_proj.scales"]
    groups = np.arange(tiny_cfg.dim) // GROUP_SIZE
    expect = ((src_q - src_z[groups]).astype(np.float32)
              * src_s[groups].astype(np.float32))
    np.testing.assert_allclose(w, expect, rtol=1e-6)
    np.testing.assert_array_equal(loaded.embed,
                                  tensors["model.embed_tokens.weight"])


def test_safetensors_reader_roundtrip(tmp_path, rng):
    """Pure-NumPy safetensors writer/reader round-trip incl. sharded index."""
    arrs = {
        "a": rng.standard_normal((4, 6)).astype(np.float32),
        "b": rng.integers(-100, 100, (3, 5)).astype(np.int32),
        "c": rng.standard_normal(7).astype(np.float16),
    }

    def write_st(path, tensors):
        header = {}
        offset = 0
        blobs = []
        dtmap = {np.float32: "F32", np.int32: "I32", np.float16: "F16"}
        for name, a in tensors.items():
            raw = a.tobytes()
            header[name] = {"dtype": dtmap[a.dtype.type],
                            "shape": list(a.shape),
                            "data_offsets": [offset, offset + len(raw)]}
            offset += len(raw)
            blobs.append(raw)
        hj = json.dumps(header).encode()
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(hj)))
            f.write(hj)
            for b in blobs:
                f.write(b)

    write_st(tmp_path / "model.safetensors", arrs)
    got = awq.read_safetensors(str(tmp_path / "model.safetensors"))
    for name, a in arrs.items():
        np.testing.assert_array_equal(got[name], a)

    # sharded layout
    shard_dir = tmp_path / "sharded"
    os.makedirs(shard_dir)
    write_st(shard_dir / "model-00001.safetensors", {"a": arrs["a"]})
    write_st(shard_dir / "model-00002.safetensors",
             {"b": arrs["b"], "c": arrs["c"]})
    with open(shard_dir / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": {"a": "model-00001.safetensors",
                                  "b": "model-00002.safetensors",
                                  "c": "model-00002.safetensors"}}, f)
    got = awq.read_safetensors_dir(str(shard_dir))
    for name, a in arrs.items():
        np.testing.assert_array_equal(got[name], a)


def test_hf_config_parsing(tiny_cfg):
    cfg = awq.config_from_hf_json(make_hf_config(tiny_cfg))
    assert cfg == tiny_cfg
    # defaults: kv heads -> n_heads, rope_theta -> 1e4
    # (weight_packer.cpp:44-50,63-69)
    minimal = json.dumps({
        "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "vocab_size": 32, "max_position_embeddings": 64})
    cfg = awq.config_from_hf_json(minimal)
    assert cfg.n_kv_heads == 4 and cfg.rope_theta == 10000.0
