#!/bin/bash
# Round-3 third queue: a LONGER quality run on the hard synthetic.
#
# The 600-step run (tmp/stage_quality.log) converged too slowly: loss
# was still falling at step 600 and held-out rare-class Dice landed at
# 0.09-0.75. Two causes: drop_ratio 0.2 keeps ~80% of background-only
# crops on a <=1% foreground task, and 600 steps x batch 8 is tiny.
# This queue re-runs with foreground-biased sampling and 5x the steps,
# then re-warms the driver's bench compile cache one last time.
#
#   nohup bash scripts/experiments/master_loop3.sh > tmp/master_loop3.log 2>&1 &
#   echo $! > tmp/master_loop3.pid
set -u
cd "$(dirname "$0")/../.."
mkdir -p tmp

RETRY_SLEEP=${RETRY_SLEEP:-180}
STAGE_TIMEOUT=${STAGE_TIMEOUT:-10800}
QUALITY_STEPS=${QUALITY_STEPS:-3000}
MAX_TRIES=${MAX_TRIES:-2}
tries_p2=0

# wait for the second queue (master_loop2.sh) to release the TPU
while kill -0 "$(cat tmp/master_loop2.pid 2>/dev/null)" 2>/dev/null; do
    echo "queue2 still running $(date -u +%H:%M:%S); waiting"
    sleep 120
done
echo "queue2 done $(date -u)"

run_stage() {  # run_stage <name> <cmd...>
    local name=$1; shift
    [ -f "tmp/done3_$name" ] && return 0
    echo "=== stage $name START $(date -u +%H:%M:%S) ==="
    timeout "$STAGE_TIMEOUT" "$@" >> "tmp/stage3_$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
        touch "tmp/done3_$name"
        echo "=== stage $name OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== stage $name rc=$rc $(date -u +%H:%M:%S) ==="
    fi
    return $rc
}

for iter in $(seq 1 20); do
    echo "--- queue3 pass $iter $(date -u) ---"

    # Pallas blend at 512^3 with the lane-fold fix (the pre-fold kernel
    # compiled to a 32x-padded 68 GB accumulator memref and the remote
    # compile helper rejected it — tmp/stage_inf32_pallas.log). A Mosaic
    # rejection is deterministic: force-done after MAX_TRIES so the rest
    # of the queue still runs (the log records the negative result).
    if [ ! -f tmp/done3_inf32_pallas2 ]; then
        run_stage inf32_pallas2 python scripts/benchmark_eval.py --stride 32 \
            --batch 128 --reps 3 --blend-impl pallas
        rc=$?
        if [ $rc -ne 0 ] && [ $rc -ne 42 ]; then
            tries_p2=$((tries_p2 + 1))
            if [ "$tries_p2" -ge "$MAX_TRIES" ]; then
                echo "inf32_pallas2: $tries_p2 failed tries; recording negative"
                touch tmp/done3_inf32_pallas2
            fi
        fi
    fi

    # Restore=True resumes from tmp/quality2/ckpt if a pass died mid-run.
    # drop_ratio is the probability of ACCEPTING an empty crop (reference
    # RandomCrop semantics): 0.05 + min_pixel 64 = strong foreground bias.
    run_stage quality2 python scripts/quickstart.py \
        --steps "$QUALITY_STEPS" --workdir tmp/quality2 \
        --drop-ratio 0.05 --min-pixel 64
    if [ -f tmp/done3_quality2 ]; then
        run_stage bench3 python bench.py
    fi

    need=0
    for s in inf32_pallas2 quality2 bench3; do
        [ -f "tmp/done3_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "--- queue3 COMPLETE $(date -u) ---"
        exit 0
    fi
    echo "--- pass $iter incomplete; sleeping $RETRY_SLEEP s ---"
    sleep "$RETRY_SLEEP"
done
echo "--- queue3 gave up $(date -u) ---"
exit 1
