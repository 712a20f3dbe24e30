#!/bin/bash
# Round-4 plain-decode (no-spec) A/B matrix — back-to-back in ONE chip
# window (VERDICT r3 item 1: close plain batch-1 7B to >=200.8 tok/s).
# Usage: tools/chip_plain_r4.sh [logfile]
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/chip_plain_r4.log}
: > "$OUT"

OPTS_V24="xla_tpu_scoped_vmem_limit_kib=24576,xla_tpu_memory_space_assignment_while_execution_count=128,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true"

run() {
  # run <name> [ENV=V ...] [-- extra bench args]
  local name="$1"; shift
  local envs=() extra=()
  while [[ $# -gt 0 ]]; do
    if [[ "$1" == "--" ]]; then shift; extra=("$@"); break; fi
    envs+=("$1"); shift
  done
  echo "=== $name ($(date -u +%H:%M:%S)Z) ===" | tee -a "$OUT"
  timeout 3600 env "${envs[@]}" python bench.py --spec none --repeats 4 \
    "${extra[@]}" 2>&1 | grep -E '^\{|run [0-9]|warmup done' >> "$OUT"
}

# bracket the window: base first and last
run base1
run mdma6_v24   LLAMA_INT4_MANUAL_DMA=6 LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run mdma6_v24_nogemv LLAMA_INT4_MANUAL_DMA=6 LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
# fused_step + mdma: untested combination — round-2 attributed the
# fused kernels' short-window loss to displacing MSA's weight-staging
# prefetch, which the manual-DMA ring removes entirely
run mdma6_v24_fstep LLAMA_INT4_MANUAL_DMA=6 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24" LLAMA_TPU_FSTEP_MIN_WINDOW=0
# per-projection hybrid (7B keys: qkv 8:12288, o 8:4096,
# gate_up 8:22528, down 22:4096): ring only for the two biggest
run hybrid_gu_down LLAMA_INT4_MANUAL_DMA="8:22528:6;22:4096:6" \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run mdma6_v24_head8 LLAMA_INT4_MANUAL_DMA=6 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24" -- --lm-head-8bit
run base2
echo "DONE $(date -u +%H:%M:%S)Z" >> "$OUT"
