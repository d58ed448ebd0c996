#!/bin/bash
# Round-5 TPU queue, final revision (supersedes master_loop5e.sh).
#
# Two fixes over 5e, both from watching it run:
#   1. 5e gated attn6k + bench (the compile-cache warm the driver's
#      round-end bench needs) on ALL five earlier stages succeeding —
#      a persistently-failing stage (pdw burned two passes on kernel
#      lowering bugs) starves them forever. Here every stage has an
#      ATTEMPT CAP; a capped-out stage is marked RESOLVED-FAILED
#      (tmp/done5_<name> + tmp/done5_<name>.FAILED) so the queue moves
#      on — the negative is recorded in BENCHMARKS.md either way.
#   2. 5e copied stage logs to records/ only when the stage RETURNED;
#      a round end mid-stage (attn6k runs up to 3.5 h) would leave the
#      log only in volatile tmp/ (round-4 verdict Missing #3). Here a
#      watcher rsyncs the log to records/round5/ every 2 min while the
#      stage runs.
#
# Takeover: adopts 5e's in-flight q3s2 child.
#   kill $(cat tmp/master_loop5e.pid)   # loop only; child keeps running
#   nohup bash scripts/experiments/master_loop5f.sh <q3s2_pid> \
#       > tmp/master_loop5f.log 2>&1 &
#   echo $! > tmp/master_loop5f.pid
set -u
cd "$(dirname "$0")/../.." || exit 1
mkdir -p tmp records/round5

Q3S2_PID=${1:-}
RETRY_SLEEP=${RETRY_SLEEP:-120}

if [ -n "$Q3S2_PID" ] && [ ! -f tmp/done5_q3s2 ]; then
    echo "=== waiting on in-flight q3s2 (pid $Q3S2_PID) $(date -u +%H:%M:%S) ==="
    while kill -0 "$Q3S2_PID" 2>/dev/null; do
        sleep 60
        cp tmp/stage5_q3s2.log records/round5/stage5_q3s2.log 2>/dev/null
    done
    cp tmp/stage5_q3s2.log records/round5/stage5_q3s2.log 2>/dev/null
    if grep -q "evaluated .* case" tmp/stage5_q3s2.log 2>/dev/null; then
        touch tmp/done5_q3s2
        echo "=== q3s2 OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== q3s2 INCOMPLETE $(date -u +%H:%M:%S) (will retry) ==="
    fi
fi

run_stage() {  # run_stage <name> <max_attempts> <timeout_s> <cmd...>
    local name=$1 cap=$2 tmo=$3; shift 3
    [ -f "tmp/done5_$name" ] && return 0
    local n=0
    [ -f "tmp/attempts5_$name" ] && n=$(cat "tmp/attempts5_$name")
    if [ "$n" -ge "$cap" ]; then
        echo "=== stage $name CAPPED after $n attempts -> RESOLVED-FAILED $(date -u +%H:%M:%S) ==="
        touch "tmp/done5_$name" "tmp/done5_$name.FAILED"
        return 0
    fi
    echo $((n + 1)) > "tmp/attempts5_$name"
    echo "=== stage $name START attempt $((n + 1))/$cap $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@" >> "tmp/stage5_$name.log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
        sleep 120
        cp "tmp/stage5_$name.log" "records/round5/stage5_$name.log" 2>/dev/null
    done
    wait "$pid"
    local rc=$?
    cp "tmp/stage5_$name.log" "records/round5/stage5_$name.log" 2>/dev/null
    if [ $rc -eq 0 ]; then
        touch "tmp/done5_$name"
        echo "=== stage $name OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== stage $name rc=$rc $(date -u +%H:%M:%S) ==="
    fi
    return $rc
}

pdw_stage() {
    python scripts/experiments/ab_train.py --log tmp/exp_r5tune.log \
        drop8_base_b96_k16 pdw_b96_k16 flatstate_b96_k16 || return $?
    cp tmp/exp_r5tune.log records/round5/exp_r5tune.log 2>/dev/null
    python scripts/select_bench_tuning.py
}

# seed the attempt counters with 5e's history (pdw failed twice there;
# one more shot with the rewritten kernel, then resolve)
[ -f tmp/attempts5_pdw ] || echo 2 > tmp/attempts5_pdw
[ -f tmp/attempts5_lits ] || echo 0 > tmp/attempts5_lits

for iter in $(seq 1 6); do
    echo "--- queue5f pass $iter $(date -u) ---"

    run_stage pdw 3 5400 bash -c "$(declare -f pdw_stage); pdw_stage"

    # same workdir as the 5e attempt: Restore=true resumes the step-200
    # checkpoint, so the re-run skips straight to the (now-fixed) eval
    run_stage lits 2 5400 python scripts/experiments/lits_rehearsal.py \
        --workdir tmp/r5_lits --steps 200

    run_stage q3s2 2 10800 python scripts/quickstart.py \
        --steps 6000 --workdir tmp/r5_q3s2 --seed 1337 \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    # attn6k runs once every earlier stage is RESOLVED (ok or capped) —
    # never starved by a failing sibling
    if [ -f tmp/done5_pdw ] && [ -f tmp/done5_lits ] && \
       [ -f tmp/done5_q3s2 ]; then
        run_stage attn6k 1 12600 python scripts/experiments/attn_quality.py \
            --workdir tmp/r5_attn --steps 6000
        run_stage bench 3 2400 python bench.py
    fi

    need=0
    for s in pdw lits q3s2 attn6k bench; do
        [ -f "tmp/done5_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "queue5f COMPLETE $(date -u)"
        for s in pdw lits q3s2 attn6k bench; do
            [ -f "tmp/done5_$s.FAILED" ] && echo "  (stage $s RESOLVED-FAILED)"
        done
        exit 0
    fi
    echo "pass $iter incomplete; sleeping $RETRY_SLEEP"
    sleep "$RETRY_SLEEP"
done
echo "queue5f EXHAUSTED RETRIES $(date -u)"
exit 1
