#!/bin/bash
# Follow-up chip queue: re-gate parity after kernel fixes (mono's
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
run bench_b1_mono python -u bench.py --attn-impl mono --repeats 4
python -u tools/pick_bench_defaults.py $LOG | tee -a $LOG/session.log

echo "=== chip followup complete $(date) ===" | tee -a $LOG/session.log
