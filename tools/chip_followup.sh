#!/bin/bash
# Follow-up chip queue: re-gate parity after kernel fixes (the retired
# mono's
# dynamic-sublane bf16 loads, attention_step's B>1 block specs) and
# re-measure the variants the first pass excluded. Run AFTER
# tools/chip_session.sh completes — never concurrently (one chip).
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

run parity python -u tools/chip_parity.py $LOG
python -u tools/pick_bench_defaults.py $LOG | tee -a $LOG/session.log

# first chip run crashed on the decode-tuned scoped-vmem limit; the
# spec-block jit now carries its own 32 MB limit
run bench_batch_spec python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --spec ngram --repeats 3

# the 1024-bucket crossover point (einsum wins at 512, fused_step at
# 2048/4096): decides LLAMA_TPU_FSTEP_MIN_WINDOW's default
run bench_1k_base python -u bench.py --max-seq 1024 --prompt-len 832 \
    --decode-steps 192 --repeats 3 --attn-impl einsum
run bench_1k_fstep python -u bench.py --max-seq 1024 --prompt-len 832 \
    --decode-steps 192 --repeats 3 --attn-impl fused_step

# capacity scaling: 64 int8-KV slots fit 16 GB at the 512 window
# (weights amortize further; the s32 metric stays the driver default)
run bench_batch_s64 python -u bench.py --mode batch --slots 64 \
    --requests 128 --kv-quant --repeats 3

# attention kernel attribution at the BATCH-1 decode shape: the XProf
# arithmetic says einsum attention+glue+staging costs ~1.5 ms/step
# (~47 us/layer) against a ~4 us/layer bandwidth bound — per-kernel
# numbers decide whether a leaner kernel is worth building
run mb_attn_b1 python -u tools/microbench_attn.py --batch 1
run mb_attn_b1_w256 python -u tools/microbench_attn.py --batch 1 \
    --window 256

# Where does the remaining 1.2 ms of batch-1 exposure live?
run profile_base python -u bench.py --repeats 2 --profile $LOG/trace_base

# Finer scoped-VMEM staging sweep around the round-1 optimum (12 MB
# beat 6 and 64; the curve between 8 and 16 was never sampled).
# LLAMA_TPU_COMPILER_OPTS is the supported per-compile tuning path
# (global XLA_FLAGS do not reach the remote TPU compiler here).
for kib in 8192 10240 14336 16384; do
    run vmem_$kib env \
        LLAMA_TPU_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=$kib \
        python -u bench.py --repeats 2
done

# Scoped-vmem x fused-kernel cross: on TPU the scoped pool ALSO bounds
# Pallas kernel-internal VMEM (blocks + multiple-buffering); measured
# round-2, uniformly negative (PERFORMANCE.md). mono/chain rows retired
# with their kernels (tools/experiments/int4_chain.py).
for kib in 32768 65536; do
    run fstep_vmem_$kib env \
        LLAMA_TPU_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=$kib \
        python -u bench.py --attn-impl fused_step --repeats 3
done

# 13B tiling: the first sweep's dependency chain broke on contracting
# matmuls and its tile list missed 13B's non-power-of-2 divisors
run sweep_13b python -u tools/sweep_int4.py --config 13b
run bench_13b_2k python -u bench.py --config 13b --max-seq 2048 \
    --prompt-len 1664 --decode-steps 256 --repeats 3

echo "=== chip followup complete $(date) ===" | tee -a $LOG/session.log
