#!/bin/bash
# Final chip batch for the round: clean re-measures + small tuning
# probes informed by the follow-up queue's results. Run after
# tools/chip_followup.sh completes — never concurrently (one chip).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session
mkdir -p $LOG
DEADLINE=${CHIP_SESSION_DEADLINE:-1787058000}

run() {
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "=== skipping $1: past deadline ===" | tee -a $LOG/session.log
        return 0
    fi
    echo "=== $1: $(date +%H:%M:%S) ===" | tee -a $LOG/session.log
    "${@:2}" > $LOG/$1.log 2>&1
    echo "--- $1 exit $? at $(date +%H:%M:%S)" | tee -a $LOG/session.log
    tail -4 $LOG/$1.log | tee -a $LOG/session.log
}

# 7B resweep with the widened tile list (the round-1 sweep only tried
# powers of two; 13B's widened sweep just won 5-17% per kernel)
run sweep_7b python -u tools/sweep_int4.py --config 7b

# 13B end-to-end with the sweep winners (now the in-code tuned table,
# ops/pallas/int4_matmul._TUNED_TILING); A/B against 84.87 baseline
run bench_13b_tuned python -u bench.py --config 13b --repeats 3

# the 1K einsum crossover point (first attempt raced a live code edit)
run bench_1k_base python -u bench.py --max-seq 1024 --prompt-len 832 \
    --decode-steps 192 --repeats 3 --attn-impl einsum

# capacity point that fits HBM (64 OOM'd during warmup double-buffer)
run bench_batch_s48 python -u bench.py --mode batch --slots 48 \
    --requests 96 --kv-quant --repeats 3

# clean re-measure of the 14336 KiB scoped-vmem point (first run was
# contaminated by a concurrent CPU test-suite run)
run vmem_14336_clean env \
    LLAMA_TPU_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=14336 \
    python -u bench.py --repeats 4

# lm_head GEMV tile: 640-row tiles double-buffer to 10.4 MB inside the
# 12 MB scoped pool (its biggest internal consumer; 8 MB limits fail
# compile on it). 256-row tiles leave headroom; 1280-row tiles test
# the other direction under a raised limit.
run gemv_tile3 env LLAMA_GEMV_TILE_MB=3 python -u bench.py --repeats 3
run gemv_tile10 env LLAMA_GEMV_TILE_MB=11 \
    LLAMA_TPU_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=26624 \
    python -u bench.py --repeats 3

# PPL-parity gate for the quantized lm_head options on the REAL model
# (real_model_e2e.sh artifacts): bf16-head geomean was 10.396772. If
# the int8/w4 head stays within the BASELINE 0.05 bar, it is a
# defensible speed default (reported alongside, never silently).
if [ -f /tmp/tinyllama/model.bin ]; then
    run ppl_head8 python -m llama_cu_awq_tpu /tmp/tinyllama/model.bin \
        -z /root/reference/tokenizer.bin -m perplexity \
        -q /tmp/corpus/valid.txt --lm-head-bits 8
    run ppl_head4 python -m llama_cu_awq_tpu /tmp/tinyllama/model.bin \
        -z /root/reference/tokenizer.bin -m perplexity \
        -q /tmp/corpus/valid.txt --lm-head-bits 4
fi

# Scheduler/MSA flag probes, chosen from the trace evidence (0.69 ms
# of staging copies + 0.68 ms of slice-done waits sit ON the core
# timeline per step) and libtpu's actual flag inventory:
#  - while_execution_count: tells MSA the decode scan's trip count
#    (128) so it can prefetch across loop iterations
#  - async_copy_bandwidth_scaling_factor: the scheduler's assumed copy
#    bandwidth; changes how early copy-starts are hoisted
#  - sliced_prefetch_max_slices: granularity of the staging slices
#  - msa_inefficient_use_to_copy_ratio: how eagerly MSA stages operands
probe() {  # probe <name> <opts>
    run flag_$1 env LLAMA_TPU_COMPILER_OPTS="$2" \
        python -u bench.py --repeats 3
}
probe while128 xla_tpu_memory_space_assignment_while_execution_count=128
probe copybw2 xla_tpu_async_copy_bandwidth_scaling_factor=2.0
probe copybw05 xla_tpu_async_copy_bandwidth_scaling_factor=0.5
probe slices2 xla_tpu_sliced_prefetch_max_slices=2
probe slices16 xla_tpu_sliced_prefetch_max_slices=16
probe copyratio05 xla_tpu_msa_inefficient_use_to_copy_ratio=0.5
probe ccvmemadj xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true

echo "=== chip final batch complete $(date) ===" | tee -a $LOG/session.log
