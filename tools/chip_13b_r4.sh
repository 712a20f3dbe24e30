#!/bin/bash
# Round-4 13B matrix (VERDICT r3 item 2: >=100 tok/s, >=85% of the HBM
# bound). Attributed sinks: KV-window staging (1.13 ms @ ~370 GB/s) and
# qkv DMA contention. Levers: the 7B-winning manual-DMA hybrid at 13B
# shapes, 13B-specific while_execution_count, int8 KV (halves the
# window staging), fused_step under the ring.
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/chip_13b_r4.log}
: > "$OUT"

OPTS_V24="xla_tpu_scoped_vmem_limit_kib=24576,xla_tpu_memory_space_assignment_while_execution_count=128,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true"
OPTS_W64="xla_tpu_scoped_vmem_limit_kib=14336,xla_tpu_memory_space_assignment_while_execution_count=64,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true"
OPTS_W256="xla_tpu_scoped_vmem_limit_kib=14336,xla_tpu_memory_space_assignment_while_execution_count=256,xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true"
# 13B hybrid: ring-6 on gate_up (10:27648) + down (28:5120) only
HYB13="10:27648:6;28:5120:6"

run() {
  local name="$1"; shift
  local envs=() extra=()
  while [[ $# -gt 0 ]]; do
    if [[ "$1" == "--" ]]; then shift; extra=("$@"); break; fi
    envs+=("$1"); shift
  done
  echo "=== $name ($(date -u +%H:%M:%S)Z) ===" | tee -a "$OUT"
  timeout 3600 env "${envs[@]}" python bench.py --config 13b --spec none \
    --repeats 4 "${extra[@]}" 2>&1 \
    | grep -E '^\{|run [0-9]|warmup done|Error' | tail -7 >> "$OUT"
}

run 13b_base
run 13b_hybrid_v24 LLAMA_INT4_MANUAL_DMA="$HYB13" LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run 13b_ring6_v24 LLAMA_INT4_MANUAL_DMA=6 LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24"
run 13b_w64 LLAMA_TPU_COMPILER_OPTS="$OPTS_W64"
run 13b_w256 LLAMA_TPU_COMPILER_OPTS="$OPTS_W256"
run 13b_kv8 -- --kv-quant
run 13b_hybrid_kv8 LLAMA_INT4_MANUAL_DMA="$HYB13" LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24" -- --kv-quant
run 13b_hybrid_fstep LLAMA_INT4_MANUAL_DMA="$HYB13" LLAMA_GEMV_MANUAL_DMA=0 \
    LLAMA_TPU_COMPILER_OPTS="$OPTS_V24" LLAMA_TPU_FSTEP_MIN_WINDOW=0
run 13b_base2
echo "DONE $(date -u +%H:%M:%S)Z" >> "$OUT"
