#!/bin/bash
# Round-2b chip queue (fresh /tmp, 1-host-core machine): re-establish
# the compile cache, then the highest-leverage probes from the
# chip_final.sh backlog, most-decisive-first. One chip — run alone.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/chip_r2b
mkdir -p $LOG
DEADLINE=${CHIP_SESSION_DEADLINE:-$(($(date +%s) + 2700))}

run() {
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "=== skipping $1: past deadline ===" | tee -a $LOG/session.log
        return 0
    fi
    echo "=== $1: $(date +%H:%M:%S) ===" | tee -a $LOG/session.log
    "${@:2}" > $LOG/$1.log 2>&1
    echo "--- $1 exit $? at $(date +%H:%M:%S)" | tee -a $LOG/session.log
    grep -E "tok/s|metric|FATAL" $LOG/$1.log | tail -4 | tee -a $LOG/session.log
}

# 1. baseline re-measure: warms the persistent compile cache for the
#    driver's round-end bench AND gives today's chip noise floor
run base python -u bench.py --repeats 4

# 2. MSA cross-iteration prefetch: the decode scan's trip count lets
#    MSA prefetch weight tiles across loop iterations — aimed exactly
#    at the 1.37 ms/step of staging copies + slice-done waits
run while128 env LLAMA_TPU_COMPILER_OPTS=xla_tpu_memory_space_assignment_while_execution_count=128 \
    python -u bench.py --repeats 3

# 3. clean 14336 KiB scoped-vmem point (186.5 dirty measure, round 2)
run vmem14336 env LLAMA_TPU_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=14336 \
    python -u bench.py --repeats 3

# 4. MSA accounting for Pallas kernels' own VMEM footprint
run ccvmemadj env LLAMA_TPU_COMPILER_OPTS=xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=true \
    python -u bench.py --repeats 3

# 5. copy-bandwidth scaling: hoist copy starts earlier/later
run copybw2 env LLAMA_TPU_COMPILER_OPTS=xla_tpu_async_copy_bandwidth_scaling_factor=2.0 \
    python -u bench.py --repeats 3

echo "=== r2b batch complete $(date) ===" | tee -a $LOG/session.log
