#!/bin/bash
# Round-4 plain-decode (no-spec) A/B matrix — back-to-back in ONE chip
# window (VERDICT r3 item 1: close plain batch-1 7B to >=200.8 tok/s).
# Usage: tools/chip_plain_r4.sh [logfile]
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/chip_plain_r4.log}
: > "$OUT"

OPTS_BASE="xla_tpu_scoped_vmem_limit_kib=14336,xla_tpu_memory_space_assignment_while_execution_count=128,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true"
OPTS_V24="xla_tpu_scoped_vmem_limit_kib=24576,xla_tpu_memory_space_assignment_while_execution_count=128,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true"

run() {
  local name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)Z) ===" | tee -a "$OUT"
  timeout 1200 env "$@" python bench.py --spec none --repeats 4 2>&1 \
    | grep -E '^\{|run [0-9]|tok/s' | tail -6 >> "$OUT"
}

# bracket the window: base first and last
run base1
run mdma6_v24   LLAMA_INT4_MANUAL_DMA=6 LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run mdma6_v24_nogemv LLAMA_INT4_MANUAL_DMA=6 LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run mdma4_v14   LLAMA_INT4_MANUAL_DMA=4
# per-projection hybrids (7B keys: qkv 8:12288, o 8:4096,
# gate_up 8:22528, down 22:4096)
run hybrid_gu_down LLAMA_INT4_MANUAL_DMA="8:22528:6;22:4096:6" \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run hybrid_qkv_gu_down LLAMA_INT4_MANUAL_DMA="8:12288:6;8:22528:6;22:4096:6" \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run base2
echo "DONE $(date -u +%H:%M:%S)Z" >> "$OUT"
