#!/usr/bin/env python
"""Standing PPL-proxy matrix over the engine's quantization levers.

The BASELINE target 'wikitext2 PPL within 0.05 of the reference'
(reference perplexity.h:99-139) cannot be measured in this image — no
production AWQ checkpoint ships and there is no network egress (see
docs/PPL_RUNBOOK.md for the full offline procedure). This tool is the
standing proxy the VERDICT asks to regenerate each round: on the
REAL-trained tiny model (tools/real_model_e2e.sh) it scores every
quantization/kernel default the engine promotes —

    KV cache   : bf16 / int8 / int4  (each x einsum and fused_step)
    lm_head    : bf16 / int8 per-row / w4-g128

Scoring runs STEPWISE through the DECODE path (T=1 steps, one token at
a time via engine._prefill block=1) — the same kernels the tokens/s
headline exercises, including the fused_step attention kernel, which a
teacher-forced block pass would never touch. Perplexity protocol
matches engine/perplexity.py (BOS prefix, f32 softmax, f64 log
accumulation, geomean over sequences).

Usage:
  python tools/ppl_matrix.py /tmp/tinyllama/model.bin \
      -z /root/reference/tokenizer.bin -q /tmp/corpus/valid.txt \
      [--seqs 30] [--platform cpu] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def stepwise_dataset_ppl(engine, dataset_text: str, max_seqs: int):
    """Geomean PPL scored one token per forward (decode path)."""
    from llama_cu_awq_tpu.engine.perplexity import END_OF_TEXT, _softmax_f32
    from llama_cu_awq_tpu.tokenizer import BOS_TOKEN

    values = []
    for seq in dataset_text.split(END_OF_TEXT)[:max_seqs]:
        toks = engine.tokenizer.encode(seq, bos=False, eos=False)
        n = min(len(toks), engine.cfg.seq_len - 1, engine.max_seq - 1)
        if n == 0:
            continue
        engine.reset()
        total = 0.0
        for i, t in enumerate([BOS_TOKEN] + toks[: n - 1]):
            row = engine._prefill([t], collect_logits=True)[0]
            probs = _softmax_f32(row)
            total += float(np.log(np.float64(probs[toks[i]])))
        ppl = float(np.exp(-total / n))
        if np.isfinite(ppl):  # protocol parity: perplexity.py skips
            values.append(ppl)  # non-finite sequences (f32 underflow)
    if not values:
        return float("nan"), 0
    return float(np.exp(np.mean([np.log(v) for v in values]))), len(values)


MATRIX = [
    # (label, engine kwargs, lm_head bits)
    ("bf16 KV, einsum", {}, None),
    ("bf16 KV, fused_step", {"attn_impl": "fused_step"}, None),
    ("int8 KV, einsum", {"kv_quant": True}, None),
    ("int8 KV, fused_step", {"kv_quant": True,
                             "attn_impl": "fused_step"}, None),
    ("int4 KV, einsum", {"kv_quant": 4}, None),
    ("int4 KV, fused_step", {"kv_quant": 4,
                             "attn_impl": "fused_step"}, None),
    ("int8 lm_head", {}, 8),
    ("w4-g128 lm_head", {}, 4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("-z", "--tokenizer", required=True)
    ap.add_argument("-q", "--dataset", required=True)
    ap.add_argument("--seqs", type=int, default=30,
                    help="sequence budget per config (138 in the full "
                         "valid split; 30 keeps the matrix ~minutes)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None, metavar="OUT")
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filter over config "
                         "labels (resume a partial matrix run)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/llama_tpu_jax_cache")

    import jax.numpy as jnp

    from llama_cu_awq_tpu.engine import InferenceEngine
    from llama_cu_awq_tpu.io.checkpoint import load_checkpoint
    from llama_cu_awq_tpu.models import (
        params_from_checkpoint,
        quantize_lm_head,
    )
    from llama_cu_awq_tpu.tokenizer import Tokenizer

    on_tpu = jax.devices()[0].platform == "tpu"
    impl = "pallas" if on_tpu else "dequant"
    ckpt = load_checkpoint(args.checkpoint)
    cfg = ckpt.config
    tok = Tokenizer(args.tokenizer, cfg.vocab_size)
    base_params = params_from_checkpoint(ckpt, tpu_layout=on_tpu)
    text = open(args.dataset).read()

    if cfg.head_dim % 128:
        log(f"NOTE: head_dim={cfg.head_dim} is not 128-divisible — the "
            "fused_step rows will fall back to einsum (train the proxy "
            "model with head_dim 128, e.g. --dim 512 --heads 4, to "
            "exercise the kernel; tools/real_model_e2e.sh does)")

    rows = []
    wanted = ([s.strip() for s in args.only.split(",")]
              if args.only else None)
    for label, kw, head_bits in MATRIX:
        if wanted and not any(w in label for w in wanted):
            continue
        params = base_params
        if head_bits:
            params = quantize_lm_head(base_params, bits=head_bits)
        eng = InferenceEngine(params, cfg, tokenizer=tok,
                              act_dtype=jnp.bfloat16, matmul_impl=impl,
                              temperature=0.0, **kw)
        ppl, n = stepwise_dataset_ppl(eng, text, args.seqs)
        rows.append({"config": label, "geomean_ppl": round(ppl, 6),
                     "sequences": n})
        log(f"{label:24s}  {ppl:.6f}  ({n} seqs)")

    if not rows:
        raise SystemExit("--only matched no matrix configs")
    # the delta column is only labeled "vs bf16" when the bf16 baseline
    # actually ran (an --only resume may exclude it)
    base_row = next((r for r in rows
                     if r["config"] == "bf16 KV, einsum"), None)
    base = (base_row or rows[0])["geomean_ppl"]
    ref = "bf16" if base_row else rows[0]["config"]
    print(f"| Config | geomean PPL | vs {ref} |")
    print("|---|---|---|")
    for r in rows:
        d = r["geomean_ppl"] / base - 1.0
        print(f"| {r['config']} | {r['geomean_ppl']:.6f} | {d:+.2%} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "checkpoint": args.checkpoint,
                       "seqs": args.seqs, "platform":
                       jax.devices()[0].platform}, f, indent=1)
        log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
