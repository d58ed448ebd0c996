#!/bin/bash
# Round-3 FOLLOW-UP queue. Waits for master_loop.sh to exit, then:
#   1. r3tune  — new tuning variants (scan-8/16, batch-112/128 via
#                chunked H2D) appended to tmp/exp_r3tune.log
#   2. trace   — fresh device trace of the production step (base_b96_k4)
#                + op breakdown, for targeting the next optimization
#   3. select2 — re-pick the winner across ALL logs -> bench_tuning.json
#   4. bench2  — re-warm the driver's compile cache at the final tuning
#
# r3tune is force-marked done after MAX_TRIES failed passes (b128 may
# permanently OOM; partial results still land in the log and select2
# uses whatever measured). Launch:
#
#   nohup bash scripts/experiments/master_loop2.sh > tmp/master_loop2.log 2>&1 &
#   echo $! > tmp/master_loop2.pid
set -u
cd "$(dirname "$0")/../.."
mkdir -p tmp

RETRY_SLEEP=${RETRY_SLEEP:-180}
STAGE_TIMEOUT=${STAGE_TIMEOUT:-10800}
MAX_TRIES=${MAX_TRIES:-2}

# wait for the primary queue (master_loop.sh) to release the TPU
while kill -0 "$(cat tmp/master_loop.pid 2>/dev/null)" 2>/dev/null; do
    echo "primary queue still running $(date -u +%H:%M:%S); waiting"
    sleep 120
done
echo "primary queue done $(date -u)"

run_stage() {  # run_stage <name> <cmd...>
    local name=$1; shift
    [ -f "tmp/done2_$name" ] && return 0
    echo "=== stage $name START $(date -u +%H:%M:%S) ==="
    timeout "$STAGE_TIMEOUT" "$@" >> "tmp/stage2_$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
        touch "tmp/done2_$name"
        echo "=== stage $name OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== stage $name rc=$rc $(date -u +%H:%M:%S) ==="
    fi
    return $rc
}

tries_r3tune=0
for iter in $(seq 1 30); do
    echo "--- queue2 pass $iter $(date -u) ---"

    if [ ! -f tmp/done2_r3tune ]; then
        run_stage r3tune python scripts/experiments/ab_train.py \
            --log tmp/exp_r3tune.log \
            base_b96_k8 base_b96_k16 base_b112_k4 base_b128_k4
        rc=$?
        if [ $rc -ne 0 ] && [ $rc -ne 42 ]; then
            tries_r3tune=$((tries_r3tune + 1))
            if [ "$tries_r3tune" -ge "$MAX_TRIES" ]; then
                echo "r3tune: $tries_r3tune failed passes; accepting partial"
                touch tmp/done2_r3tune
            fi
        fi
    fi

    if [ -f tmp/done2_r3tune ]; then
        run_stage trace bash -c "
            python scripts/experiments/capture_trace.py base_b96_k4 \
                --trace-dir tmp/trace_r3 &&
            python scripts/analyze_trace.py tmp/trace_r3 --top 40 --group \
                > tmp/trace_r3_summary.txt"
        run_stage select2 python scripts/select_bench_tuning.py
    fi
    if [ -f tmp/done2_select2 ]; then
        run_stage bench2 python bench.py
    fi

    need=0
    for s in r3tune trace select2 bench2; do
        [ -f "tmp/done2_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "--- queue2 COMPLETE $(date -u) ---"
        exit 0
    fi
    echo "--- pass $iter incomplete; sleeping $RETRY_SLEEP s ---"
    sleep "$RETRY_SLEEP"
done
echo "--- queue2 gave up $(date -u) ---"
exit 1
