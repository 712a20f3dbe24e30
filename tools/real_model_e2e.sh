#!/bin/bash
# Real-model end-to-end: train a small REAL Llama on real text (TPU),
# export AWQ (original interleaved format), pack with the native
# weight_packer, then generate / chat / perplexity through the full
# engine — the analog of the reference's README transcript
# (/root/reference/README.md:88-112) in a hermetic, zero-egress image.
#
# Usage: bash tools/real_model_e2e.sh [outdir] [steps]
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/tinyllama}
STEPS=${2:-3000}
CORPUS=${REAL_E2E_CORPUS:-/tmp/corpus}
TOK=/root/reference/tokenizer.bin

[ -f $CORPUS/train.txt ] || python tools/build_corpus.py --out $CORPUS

# 1. train (dim 512 / hidden 1536 / 8L / 4H, ~50M params). 4 heads —
# NOT the rounds-2-4 8 — so head_dim = 128 and the REAL decode kernels
# (fused_step attention, batched) engage in the PPL matrix below;
# with head_dim 64 every kernel silently fell back to einsum and the
# matrix never exercised what the headline runs (VERDICT r4 item 8).
python -u tools/train_tiny.py --corpus $CORPUS --out $OUT --steps $STEPS \
    --heads 4 --kv-heads 4

# 2. pack through the offline pipeline (native packer, old AWQ format)
cmake -B native/build -G Ninja native >/dev/null && ninja -C native/build
native/build/weight_packer $OUT/awq/config.json $OUT/awq $OUT/model.bin 1

# 3. transcripts: greedy + the reference's default sampling
python -m llama_cu_awq_tpu $OUT/model.bin -z $TOK -t 0.0 -n 64 \
    -i "The gradient of a function" | tee $OUT/transcript_greedy.txt
python -m llama_cu_awq_tpu $OUT/model.bin -z $TOK -t 0.5 -p 0.6 -s 1234 \
    -n 64 -i "To install the package," | tee $OUT/transcript_sampled.txt

# 3b. speculative decoding on REAL text: same greedy prompt with and
# without --spec; output must match and spec reports its acceptance
# (real prose is where prompt-lookup earns its speedup)
python -m llama_cu_awq_tpu $OUT/model.bin -z $TOK -t 0.0 -n 128 \
    -i "The derivative of a function measures" \
    | tee $OUT/transcript_plain.txt
python -m llama_cu_awq_tpu $OUT/model.bin -z $TOK -t 0.0 -n 128 \
    -i "The derivative of a function measures" --spec ngram \
    | tee $OUT/transcript_spec.txt

# 4. perplexity parity: pallas path (TPU) vs the f32 dequant oracle (CPU)
python -m llama_cu_awq_tpu $OUT/model.bin -z $TOK -m perplexity \
    -q $CORPUS/valid.txt | tee $OUT/ppl_pallas.txt
python -m llama_cu_awq_tpu $OUT/model.bin -z $TOK -m perplexity \
    -q $CORPUS/valid.txt --platform cpu --impl dequant \
    | tee $OUT/ppl_oracle.txt

grep -h "Geomean perplexity" $OUT/ppl_pallas.txt $OUT/ppl_oracle.txt

# 5. decode throughput through the REAL checkpoint (VERDICT r4 item 6):
# loader + tokenizer + kernels + sampler measured jointly at speed; the
# dual run reports plain AND spec tok/s with real-prose acceptance
python bench.py --model $OUT/model.bin -z $TOK --steps 128 --repeats 3 \
    | tee $OUT/bench_decode_real.json

# 6. the standing PPL matrix over every promotable quantization lever
# (decode-path stepwise scoring — the same kernels the headline runs)
# (stepwise scoring costs one device call per token; 12 seqs x 8
# configs keeps the matrix ~15 min on the tunneled chip — raise for
# the full-precision regeneration, tools/ppl_matrix.py --seqs)
python tools/ppl_matrix.py $OUT/model.bin -z $TOK -q $CORPUS/valid.txt \
    --seqs 12 --json $OUT/ppl_matrix.json | tee $OUT/ppl_matrix.md
