"""Perplexity evaluation (parity harness for reference perplexity.h).

Same protocol: the dataset is split on "<|endoftext|>"; each sequence is
encoded without BOS/EOS, prefixed with BOS, teacher-forced through the
network (truncated to seq_len - 1 tokens), and scored as
exp(-mean(log p(token_i | prefix))) with f32 softmax and f64 log
accumulation (perplexity.h:27-51); the dataset score is the geometric
mean over sequences (perplexity.h:138).

Unlike the reference (one forward per token, perplexity.h:79-82), the
teacher-forced pass runs as batched prefill blocks — identical logits,
orders of magnitude faster.
"""

from __future__ import annotations

import numpy as np

from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

END_OF_TEXT = "<|endoftext|>"


def _softmax_f32(row: np.ndarray) -> np.ndarray:
    row = row.astype(np.float32)
    row = np.exp(row - row.max())
    return row / row.sum()


def sequence_perplexity(engine, text: str, verbose: bool = False) -> float:
    """Perplexity of one text sequence (perplexity.h:57-96)."""
    tok = engine.tokenizer
    data_tokens = tok.encode(text, bos=False, eos=False)
    n = len(data_tokens)
    if n >= engine.cfg.seq_len:
        n = engine.cfg.seq_len - 1
        if verbose:
            print(f"\nTruncated to {n} tokens", flush=True)
    if n == 0:
        return float("nan")

    engine.reset()
    # inputs: [BOS] + data[:n-1]; row i predicts data[i]
    inputs = [BOS_TOKEN] + data_tokens[: n - 1]
    logits = engine._prefill(inputs, collect_logits=True)  # (n, vocab) f32

    total = 0.0  # f64 accumulation (perplexity.h:29)
    for i in range(n):
        probs = _softmax_f32(logits[i])
        total += float(np.log(np.float64(probs[data_tokens[i]])))
    return float(np.exp(-total / n))


def dataset_perplexity(engine, dataset_text: str, verbose: bool = False):
    """Split on <|endoftext|> and geomean sequence perplexities
    (perplexity.h:99-139). Returns (geomean, count, per_seq list)."""
    seqs = dataset_text.split(END_OF_TEXT)
    # reference keeps empty trailing pieces as sequences only when the
    # file doesn't end with the delimiter; empty text yields 0 tokens and
    # is skipped here (the reference would divide by zero)
    values = []
    for seq in seqs:
        p = sequence_perplexity(engine, seq, verbose)
        if np.isfinite(p):
            values.append(p)
            if verbose:
                print(f"\nPerplexity computed: {p:f}", flush=True)
    if not values:
        return float("nan"), 0, []
    log_mean = np.mean([np.log(v) for v in values])
    return float(np.exp(log_mean)), len(values), values
