"""tools/export_tokenizer.py: sentencepiece .model -> llama2.c
tokenizer.bin conversion (manual protobuf walk, no sentencepiece
dependency) and validated-copy of existing artifacts."""

import struct
import subprocess
import sys

import pytest

from llama_cu_awq_tpu.tokenizer import Tokenizer
from tools.export_tokenizer import (
    copy_validated_bin,
    export_from_sentencepiece,
    parse_sentencepiece_model,
)

REFERENCE_TOKENIZER = "/root/reference/tokenizer.bin"


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _sp_piece(piece: bytes, score: float, ptype: int) -> bytes:
    body = (bytes([0x0A]) + _varint(len(piece)) + piece        # 1: piece
            + bytes([0x15]) + struct.pack("<f", score)         # 2: score
            + bytes([0x18]) + _varint(ptype))                  # 3: type
    return bytes([0x0A]) + _varint(len(body)) + body           # pieces=1


def make_sp_model(pieces):
    blob = b"".join(_sp_piece(p, s, t) for p, s, t in pieces)
    # append an unrelated field the parser must skip (trainer_spec=2)
    blob += bytes([0x12]) + _varint(3) + b"xyz"
    return blob


def test_sentencepiece_export_roundtrip(tmp_path):
    pieces = [
        (b"<unk>", 0.0, 2),
        (b"<s>", 0.0, 3),
        (b"</s>", 0.0, 3),
        (b"<0x41>", 0.0, 6),          # BYTE piece -> raw b"A"
        ("▁hello".encode(), -1.5, 1),  # boundary marker -> b" hello"
        (b"world", -2.25, 1),
    ]
    model = tmp_path / "tok.model"
    model.write_bytes(make_sp_model(pieces))

    parsed = parse_sentencepiece_model(str(model))
    assert [p for p, _, _ in parsed] == [p for p, _, _ in pieces]

    out = tmp_path / "tok.bin"
    n = export_from_sentencepiece(str(model), str(out))
    assert n == len(pieces)
    tok = Tokenizer(str(out), len(pieces))
    assert tok.vocab[3] == b"A"          # byte piece decoded
    assert tok.vocab[4] == b" hello"     # U+2581 -> space
    assert tok.scores[5] == pytest.approx(-2.25)
    assert tok.max_token_length == 6


def test_copy_validated_bin(tmp_path):
    out = tmp_path / "tokenizer.bin"
    n = copy_validated_bin(REFERENCE_TOKENIZER, str(out), 32000)
    assert n == 32000
    assert out.read_bytes() == open(REFERENCE_TOKENIZER, "rb").read()
    # and the CLI entry point works end-to-end
    r = subprocess.run(
        [sys.executable, "tools/export_tokenizer.py", "--from-bin",
         REFERENCE_TOKENIZER, "-o", str(tmp_path / "t2.bin")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "t2.bin").stat().st_size > 0


def test_copy_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\x01\x02\x03")
    with pytest.raises(Exception):
        copy_validated_bin(str(bad), str(tmp_path / "o.bin"), 32000)
