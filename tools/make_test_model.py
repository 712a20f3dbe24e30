#!/usr/bin/env python
"""Create a tiny random model.bin (+ matching llama2.c tokenizer.bin)
for smoke-testing the CLI without a real AWQ checkpoint.

Usage: python tools/make_test_model.py <outdir> [--vocab-size N] [--real-tokenizer]
"""

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llama_cu_awq_tpu.config import ModelConfig
from llama_cu_awq_tpu.io.checkpoint import random_checkpoint, save_checkpoint


def write_byte_tokenizer(path: str, vocab_size: int) -> None:
    """Tokenizer whose vocab is specials + raw bytes + filler (valid
    llama2.c format, byte-fallback only)."""
    vocab = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    vocab += [(bytes([b]), -1.0) for b in range(256)]
    while len(vocab) < vocab_size:
        vocab.append((b"<pad%d>" % len(vocab), -1000.0))
    with open(path, "wb") as f:
        f.write(struct.pack("<i", max(len(v) for v, _ in vocab)))
        for piece, score in vocab[:vocab_size]:
            f.write(struct.pack("<fi", score, len(piece)))
            f.write(piece)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--vocab-size", type=int, default=512)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=256)
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    cfg = ModelConfig(dim=args.dim, hidden_dim=args.dim * 2 + args.dim // 2,
                      n_layers=args.layers, n_heads=4, n_kv_heads=2,
                      vocab_size=args.vocab_size, seq_len=args.seq_len)
    ckpt = random_checkpoint(cfg, seed=0)
    model_path = os.path.join(args.outdir, "model.bin")
    tok_path = os.path.join(args.outdir, "tokenizer.bin")
    save_checkpoint(model_path, ckpt)
    write_byte_tokenizer(tok_path, cfg.vocab_size)
    print(f"wrote {model_path} and {tok_path}")


if __name__ == "__main__":
    main()
