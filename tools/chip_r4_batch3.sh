#!/bin/bash
# Round-4 chip batch 3: prefill-kernel A/B + kv4 deep-window A/B after
# the Mosaic lane-constraint fixes (batch 2's kernel rows all failed to
# lower; parity now green on chip).
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/chip_r4_batch3.log}
: > "$OUT"

run() {
  local name="$1"; shift
  local envs=() extra=()
  while [[ $# -gt 0 ]]; do
    if [[ "$1" == "--" ]]; then shift; extra=("$@"); break; fi
    envs+=("$1"); shift
  done
  echo "=== $name ($(date -u +%H:%M:%S)Z) ===" | tee -a "$OUT"
  timeout 3600 env "${envs[@]}" python bench.py --repeats 4 \
    "${extra[@]}" 2>&1 | grep -E '^\{|run [0-9]|warmup done|Error' \
    | tail -8 >> "$OUT"
}

# A. prefill kernel A/B (VERDICT item 4: >=11k tok/s at 2K/7B)
run pf2016_b512_kernel LLAMA_TPU_PREFILL_BLOCK=512 \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf2016_b512_einsum LLAMA_TPU_PREFILL_BLOCK=512 \
    LLAMA_TPU_PREFILL_ATTN=einsum \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf2016_b256_kernel LLAMA_TPU_PREFILL_BLOCK=256 \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf2016_b1024_kernel LLAMA_TPU_PREFILL_BLOCK=1024 \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf496_b128_kernel \
    -- --spec none --mode prefill --prompt-len 496
run pf496_b128_einsum LLAMA_TPU_PREFILL_ATTN=einsum \
    -- --spec none --mode prefill --prompt-len 496
run pf496_b512_kernel LLAMA_TPU_PREFILL_BLOCK=496 \
    -- --spec none --mode prefill --prompt-len 496
run pf13b_496_b128_kernel \
    -- --spec none --mode prefill --prompt-len 496 --config 13b
run pf13b_496_b128_einsum LLAMA_TPU_PREFILL_ATTN=einsum \
    -- --spec none --mode prefill --prompt-len 496 --config 13b

# B. kv4 deep-window A/B (item 5) + kv8 fstep same window
run kv4_2048_fstep -- --spec none --kv-bits 4 --max-seq 2048 \
    --prompt-len 1900 --decode-steps 256
run kv4_2048_einsum LLAMA_TPU_FSTEP_KV4=0 -- --spec none --kv-bits 4 \
    --max-seq 2048 --prompt-len 1900 --decode-steps 256
run kv8_2048_fstep -- --spec none --kv-quant --max-seq 2048 \
    --prompt-len 1900 --decode-steps 256

echo "DONE $(date -u +%H:%M:%S)Z" >> "$OUT"
