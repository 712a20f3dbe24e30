#!/bin/bash
# Round-2 chip measurement queue: run back-to-back once the TPU tunnel
# is reachable, logging each step. Priority order: the batch-1 kernel
# A/B matrix first (it decides bench_defaults.json for the driver's
# round-end bench), then serving, real-model e2e, long-context, 13B.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session
mkdir -p $LOG

# Stop dispatching new items near the round's end so the driver's own
# bench.py run gets the chip to itself (round-2 session extended at
# epoch 1787006090 with ~12h of budget; items run <=15 min, so a
# ~1h guard suffices; override with CHIP_SESSION_DEADLINE).
DEADLINE=${CHIP_SESSION_DEADLINE:-1787038000}

run() {  # run <name> <cmd...>
    if [ -n "${CHIP_SESSION_DRYRUN:-}" ]; then
        echo "DRYRUN $1: ${*:2}"
        return 0
    fi
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "=== skipping $1: past deadline ===" | tee -a $LOG/session.log
        return 0
    fi
    echo "=== $1: $(date +%H:%M:%S) ===" | tee -a $LOG/session.log
    "${@:2}" > $LOG/$1.log 2>&1
    echo "--- $1 exit $? at $(date +%H:%M:%S)" | tee -a $LOG/session.log
    tail -4 $LOG/$1.log | tee -a $LOG/session.log
}

# 0a. parity gate: every A/B variant vs the einsum path ON CHIP at a
# small kernel-engaging shape; writes $LOG/parity.json, which
# pick_bench_defaults.py requires before promoting a variant
run parity python -u tools/chip_parity.py $LOG

# 1. batch-1 A/B matrix (VERDICT item 2) — decides the tuned default.
# Order: proven base first (anchor; warm compile cache from round 1),
# then variants by expected win.
# The picker runs after each item so a partial session still tunes.
run bench_b1_base python -u bench.py --repeats 4
python -u tools/pick_bench_defaults.py $LOG | tee -a $LOG/session.log
python -u tools/pick_bench_defaults.py $LOG | tee -a $LOG/session.log
run bench_b1_fstep python -u bench.py --attn-impl fused_step --repeats 4
run bench_b1_batched python -u bench.py --attn-impl batched --repeats 4
python -u tools/pick_bench_defaults.py $LOG | tee -a $LOG/session.log

# kernel variant microbench (early exit vs static; int8/bf16;
# fused_step; vs einsum) — per-kernel attribution, after the
# headline matrix so a short window spends chip time on the verdict
run mb_attn python -u tools/microbench_attn.py

# beyond-parity: greedy speculative decoding (own metric names; never
# picked as the driver default)
run bench_b1_spec python -u bench.py --spec ngram --repeats 3
run bench_batch_spec python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --spec ngram --repeats 3

# 2. serving A/B (VERDICT item 1)
run bench_batch_base python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --repeats 3
run bench_batched python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --attn-impl batched --repeats 3
run bench_batched_static python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --attn-impl batched_static --repeats 3
run bench_batched_fstep python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --attn-impl fused_step --repeats 3
python -u tools/pick_bench_defaults.py $LOG | tee -a $LOG/session.log

# 2b. admission smoothness A/B: long-prompt admissions mixed into the
# decode stream — interleaved prefill (default) vs the stalling
# synchronous path (engine/batch.py _advance_prefill)
run bench_admit_interleaved python -u bench.py --mode batch --slots 32 \
    --requests 64 --kv-quant --admit-long 384 --repeats 3
run bench_admit_sync env LLAMA_TPU_SYNC_PREFILL=1 python -u bench.py \
    --mode batch --slots 32 --requests 64 --kv-quant --admit-long 384 \
    --repeats 3

# 3. train the real model (TPU, ~10 min), full e2e incl. PPL parity
run real_e2e bash tools/real_model_e2e.sh /tmp/tinyllama 3000

# 4. long-context decode: 2K and 4K windows (untimed full-prompt
# prefill, then 256 timed decode steps at depth — pure decode tok/s)
run bench_2k python -u bench.py --max-seq 2048 --prompt-len 1664 \
    --decode-steps 256 --repeats 3
run bench_2k_fstep python -u bench.py --max-seq 2048 --prompt-len 1664 \
    --decode-steps 256 --repeats 3 --attn-impl fused_step
run bench_2k_flash python -u bench.py --max-seq 2048 --prompt-len 1664 \
    --decode-steps 256 --repeats 3 --attn-impl flash
run bench_4k python -u bench.py --max-seq 4096 --prompt-len 3712 \
    --decode-steps 256 --repeats 3 --attn-impl fused_step
run bench_4k_base python -u bench.py --max-seq 4096 --prompt-len 3712 \
    --decode-steps 256 --repeats 3

# 5. 13B: tiling sweep then bench (best decode config + base)
run sweep_13b python -u tools/sweep_int4.py --config 13b
run bench_13b python -u bench.py --config 13b --repeats 4

echo "=== chip session complete $(date) ===" | tee -a $LOG/session.log
