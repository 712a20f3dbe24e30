#!/bin/bash
# Round-4 chip batch 2: prefill-kernel parity + A/B, plain-decode
# refinements on top of the promoted decode_plain profile, and the
# kv4 deep-window A/B (VERDICT r3 items 4, 1, 5).
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/chip_r4_batch2.log}
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
    "${extra[@]}" 2>&1 | grep -E '^\{|run [0-9]|warmup done|acceptance' \
    >> "$OUT"
}

echo "--- prefill kernel on-chip parity ---" >> "$OUT"
timeout 3600 python tools/chip_parity_prefill.py >> "$OUT" 2>&1 \
  || { echo "PARITY FAILED — skipping prefill A/B" >> "$OUT"; }

# A. prefill kernel A/B (VERDICT item 4: >=11k tok/s at 2K/7B)
run pf2016_b512_kernel LLAMA_TPU_PREFILL_BLOCK=512 \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf2016_b512_einsum LLAMA_TPU_PREFILL_BLOCK=512 \
    LLAMA_TPU_PREFILL_ATTN=einsum \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf2016_b256_kernel LLAMA_TPU_PREFILL_BLOCK=256 \
    -- --spec none --mode prefill --prompt-len 2016 --max-seq 2048
run pf496_b128_kernel \
    -- --spec none --mode prefill --prompt-len 496
run pf496_b512_kernel LLAMA_TPU_PREFILL_BLOCK=496 \
    -- --spec none --mode prefill --prompt-len 496

# B. plain-decode refinements (decode_plain profile is now the
#    --spec none default: hybrid ring6 gate_up+down, 24MB vmem)
run plain_default_ref -- --spec none
run plain_ring8_v32 LLAMA_INT4_MANUAL_DMA=8 LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="xla_tpu_scoped_vmem_limit_kib=32768,xla_tpu_memory_space_assignment_while_execution_count=128,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true" \
    -- --spec none
run plain_hybrid_c256 -- --spec none --chunk-size 256
run plain_hybrid_kv8 -- --spec none --kv-quant
run plain_default_ref2 -- --spec none

# C. kv4 deep-window A/B (item 5: fused_step kv4 vs einsum kv4 at 2048)
run kv4_2048_fstep -- --spec none --kv-bits 4 --max-seq 2048 \
    --prompt-len 1900 --decode-steps 256
run kv4_2048_einsum LLAMA_TPU_FSTEP_KV4=0 -- --spec none --kv-bits 4 \
    --max-seq 2048 --prompt-len 1900 --decode-steps 256
run kv8_2048_fstep -- --spec none --kv-quant --max-seq 2048 \
    --prompt-len 1900 --decode-steps 256

echo "DONE $(date -u +%H:%M:%S)Z" >> "$OUT"
