import os
import struct

import pytest

from llama_cu_awq_tpu.tokenizer import BOS_TOKEN, EOS_TOKEN, Tokenizer
from tests.conftest import REFERENCE_TOKENIZER

needs_ref_tokenizer = pytest.mark.skipif(
    not os.path.exists(REFERENCE_TOKENIZER),
    reason="reference tokenizer.bin not available",
)


def write_toy_tokenizer(path, vocab_scores):
    """Emit a llama2.c-format tokenizer.bin (format: tokenizer.h:47-58)."""
    max_len = max(len(v) for v, _ in vocab_scores)
    with open(path, "wb") as f:
        f.write(struct.pack("<i", max_len))
        for piece, score in vocab_scores:
            f.write(struct.pack("<fi", score, len(piece)))
            f.write(piece)


@pytest.fixture
def toy_tokenizer(tmp_path):
    # vocab: 0..2 specials, 3..258 byte-fallback slots, then text pieces
    vocab = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    vocab += [(bytes([b]), 0.0) for b in range(256)]
    extra = [
        (b" ", -1.0), (b"a", -2.0), (b"b", -3.0), (b"ab", -0.5),
        (b" ab", -0.25), (b"c", -4.0), (b"abc", -6.0),
    ]
    vocab += extra
    path = tmp_path / "tok.bin"
    write_toy_tokenizer(path, vocab)
    return Tokenizer(str(path), len(vocab))


def test_toy_encode_merges(toy_tokenizer):
    t = toy_tokenizer
    ids = t.encode("ab", bos=True, eos=False)
    # " " dummy prefix merges with "ab" into " ab" (score -0.25 beats others)
    assert ids == [BOS_TOKEN, t.str_lookup(b" ab")]


def test_toy_encode_greedy_order(toy_tokenizer):
    t = toy_tokenizer
    # "abc": " ab"+"c" (merge " a"? not in vocab). "abc" exists but greedy
    # merges best-scoring pair first: "ab" (-0.5) then " ab" (-0.25);
    # " ab"+"c" = " abc" not in vocab, so final: [" ab", "c"]
    ids = t.encode("abc", bos=False, eos=True)
    assert ids == [t.str_lookup(b" ab"), t.str_lookup(b"c"), EOS_TOKEN]


def test_toy_byte_fallback(toy_tokenizer):
    t = toy_tokenizer
    ids = t.encode("\x07", bos=False, eos=False)  # BEL not in text vocab
    assert ids[0] == t.str_lookup(b" ")
    assert ids[1] == 0x07 + 3  # +3 byte-fallback offset (tokenizer.h:179-183)


def test_toy_empty_string(toy_tokenizer):
    # empty text: no dummy prefix (tokenizer.h:132)
    assert toy_tokenizer.encode("", bos=True, eos=True) == [BOS_TOKEN, EOS_TOKEN]


def test_decode_byte_piece(toy_tokenizer):
    t = toy_tokenizer
    # vocab slot 3+0x41 is the raw byte "A"
    piece = t.decode(0, 3 + 0x41)
    assert piece == b"A"


def test_safe_piece_filters_control_bytes():
    assert Tokenizer.safe_piece(b"\x07") == ""
    assert Tokenizer.safe_piece(b"A") == "A"
    assert Tokenizer.safe_piece(b"\n") == "\n"
    assert Tokenizer.safe_piece(b"hello") == "hello"
    assert Tokenizer.safe_piece(b"") == ""


@needs_ref_tokenizer
def test_llama_vocab_loads():
    t = Tokenizer(REFERENCE_TOKENIZER, 32000)
    assert t.vocab[BOS_TOKEN] == b"\n<s>\n"
    assert len(t.vocab) == 32000


@needs_ref_tokenizer
def test_llama_known_encoding():
    t = Tokenizer(REFERENCE_TOKENIZER, 32000)
    # Known llama-2 SentencePiece encodings (stable public facts)
    ids = t.encode("Hello world", bos=True, eos=False)
    assert ids[0] == BOS_TOKEN
    decoded = b"".join(t.decode(ids[i - 1], ids[i]) for i in range(1, len(ids)))
    assert decoded == b"Hello world"


@needs_ref_tokenizer
def test_llama_byte_fallback_roundtrip_latin():
    t = Tokenizer(REFERENCE_TOKENIZER, 32000)
    text = "café au lait"
    ids = t.encode(text, bos=True, eos=False)
    decoded = b"".join(t.decode(ids[i - 1], ids[i]) for i in range(1, len(ids)))
    assert decoded.decode("utf-8") == text


@needs_ref_tokenizer
def test_llama_byte_fallback_reference_parity():
    """This tokenizer.bin stores byte-fallback pieces as UTF-8-encoded
    codepoints (llama2.c export quirk), so multi-byte emoji do NOT
    round-trip — the reference C implementation prints the same mojibake.
    We assert parity with that behavior, not with ideal SentencePiece."""
    t = Tokenizer(REFERENCE_TOKENIZER, 32000)
    # byte-fallback slot 3+0xE2 holds UTF-8 of U+00E2, not raw byte 0xE2
    assert t.vocab[3 + 0xE2] == b"\xc3\xa2"
    ids = t.encode("☃", bos=False, eos=False)
    # ids still land in the byte-fallback range / merged pieces, and decode
    # concatenates the stored (re-encoded) pieces like the reference does
    decoded = b"".join(t.decode(0, i) for i in ids)
    assert decoded == b" \xc3\xa2\xc2\x98\xc2\x83"


@needs_ref_tokenizer
def test_llama_decode_bos_space_strip():
    t = Tokenizer(REFERENCE_TOKENIZER, 32000)
    ids = t.encode("Hi", bos=True, eos=False)
    first = t.decode(BOS_TOKEN, ids[1])
    assert not first.startswith(b" ")  # PR #89 semantics (tokenizer.h:71)


# ---------------------------------------------------------------------------
# native merge loop (native/bpe_tokenizer.cpp) vs the Python implementation


@needs_ref_tokenizer
def test_native_merger_loads():
    """The ctypes fast path must actually load a real library here (the
    repo ships the source and the image ships g++)."""
    tok = Tokenizer(REFERENCE_TOKENIZER, 32000)
    assert tok._native is not None


@needs_ref_tokenizer
def test_native_matches_python_merge():
    """Native and Python merges agree token-for-token on text exercising
    merges, byte fallback, multi-byte UTF-8, and repetition."""
    import os as _os

    tok = Tokenizer(REFERENCE_TOKENIZER, 32000)
    if tok._native is None:
        pytest.skip("no native tokenizer library")
    py = Tokenizer(REFERENCE_TOKENIZER, 32000)
    py._native = None
    samples = [
        "hello world",
        "The quick brown fox jumps over the lazy dog. " * 20,
        "naïve façade — ünïcödé 🙂🙂",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "x",
        " leading and trailing  spaces   ",
        "int main() { return 0; } // code-ish [INST] <<SYS>>",
        "\n\n\t tabs\nand newlines \n",
    ]
    # plus deterministic pseudo-random byte soup (valid utf-8 mix)
    rng = __import__("numpy").random.default_rng(7)
    for _ in range(5):
        samples.append("".join(chr(int(c)) for c in
                               rng.integers(32, 0x2FFF, size=200)))
    for s in samples:
        for bos, eos in [(True, False), (False, False), (True, True)]:
            assert tok.encode(s, bos, eos) == py.encode(s, bos, eos), s


@needs_ref_tokenizer
def test_long_prompt_encode_is_fast():
    """A 10K-char prompt must encode in well under 100 ms (the reference
    merge loop is O(n^2) per scan; ours is a lazy-heap O(n log n))."""
    import time

    tok = Tokenizer(REFERENCE_TOKENIZER, 32000)
    text = ("The quick brown fox jumps over the lazy dog near the bank "
            "of the river while 42 ships sail away. ") * 105  # ~10.4K chars
    assert len(text) > 10_000
    tok.encode(text[:100], bos=True, eos=False)  # warm the lookup
    t0 = time.perf_counter()
    ids = tok.encode(text, bos=True, eos=False)
    dt = time.perf_counter() - t0
    assert len(ids) > 1000
    assert dt < 0.1, f"encode took {dt*1e3:.1f} ms"
    # and the pure-Python fallback is itself sub-quadratic: merging the
    # same prompt without the native library must stay interactive
    tok._native = None
    t0 = time.perf_counter()
    ids_py = tok.encode(text, bos=True, eos=False)
    dt_py = time.perf_counter() - t0
    assert ids_py == ids
    assert dt_py < 2.0, f"python encode took {dt_py*1e3:.1f} ms"
