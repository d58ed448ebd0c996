#!/bin/bash
# Round-5 TPU queue, takeover revision (supersedes master_loop5c.sh).
#
# Why: the first pdw pass failed on a REAL bug — the Pallas dW kernel's
# z-chunk block violated Mosaic's sublane tiling rule (interp-mode CPU
# tests don't enforce it; the TPU lowering does). The kernel is fixed
# (dw_conv.py _pick_z_chunk: sublane-aligned chunks + tile-rounded halo
# extent + dead-tail array padding) and under 5c's stage order the
# re-measure would only come AFTER ~10 h of quality stages — too late to
# act on the answer. This queue adopts 5c's in-flight q2d2 child (pid in
# $1 — 5c itself is killed at takeover), then runs pdw FIRST.
#
#   pdw    — re-measure pdw_b96_k16 with the fixed kernel (incumbent +
#            flatstate rows already in tmp/exp_r5tune.log are skipped by
#            ab_train idempotency), then the >1% selector.
#   q2d2   — only if the adopted child did not finish (resumes from its
#            orbax checkpoint).
#   qmm    — multimodal quality, resumes from the epoch-400 checkpoint.
#   lits   — reference-geometry rehearsal (256x256x32 patches).
#   q3s2   — quality3 reproducibility at seed 1337.
#   attn6k — stretch: extend the attention quality run 3000 -> 6000
#            steps (BENCHMARKS "Quality: attention-gated V-Net" found
#            the 3000-step net undertrained). Non-gating for bench.
#   bench  — compile-cache warm for the driver's round-end run.
#
#   nohup bash scripts/experiments/master_loop5e.sh <q2d2_pid> \
#       > tmp/master_loop5e.log 2>&1 &
#   echo $! > tmp/master_loop5e.pid
set -u
cd "$(dirname "$0")/../.." || exit 1
mkdir -p tmp records/round5

Q2D2_PID=${1:-}
RETRY_SLEEP=${RETRY_SLEEP:-120}

if [ -n "$Q2D2_PID" ] && [ ! -f tmp/done5_q2d2 ]; then
    echo "=== waiting on in-flight q2d2 (pid $Q2D2_PID) $(date -u +%H:%M:%S) ==="
    while kill -0 "$Q2D2_PID" 2>/dev/null; do sleep 30; done
    cp tmp/stage5_q2d2.log records/round5/stage5_q2d2.log 2>/dev/null
    if grep -q "evaluated .* case" tmp/stage5_q2d2.log 2>/dev/null; then
        touch tmp/done5_q2d2
        echo "=== q2d2 OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== q2d2 INCOMPLETE $(date -u +%H:%M:%S) (will retry) ==="
    fi
fi

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    [ -f "tmp/done5_$name" ] && return 0
    echo "=== stage $name START $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@" >> "tmp/stage5_$name.log" 2>&1
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

for iter in $(seq 1 8); do
    echo "--- queue5e pass $iter $(date -u) ---"

    run_stage pdw 5400 bash -c \
        "$(declare -f pdw_stage); pdw_stage"

    run_stage q2d2 9000 python scripts/quickstart.py --rank2 \
        --steps 6000 --workdir tmp/r5_q2d2 \
        --n-train 64 --augment --drop-ratio 0.05 --min-pixel 4

    run_stage qmm 10800 python scripts/quickstart.py --multimodal \
        --steps 6000 --workdir tmp/r5_qmm \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    run_stage lits 5400 python scripts/experiments/lits_rehearsal.py \
        --workdir tmp/r5_lits --steps 200

    run_stage q3s2 10800 python scripts/quickstart.py \
        --steps 6000 --workdir tmp/r5_q3s2 --seed 1337 \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    if [ -f tmp/done5_pdw ] && [ -f tmp/done5_q2d2 ] && \
       [ -f tmp/done5_qmm ] && [ -f tmp/done5_lits ] && \
       [ -f tmp/done5_q3s2 ]; then
        run_stage attn6k 12600 python scripts/experiments/attn_quality.py \
            --workdir tmp/r5_attn --steps 6000
        run_stage bench 1800 python bench.py
    fi

    need=0
    for s in pdw q2d2 qmm lits q3s2 attn6k bench; do
        [ -f "tmp/done5_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "queue5e COMPLETE $(date -u)"
        exit 0
    fi
    echo "pass $iter incomplete; sleeping $RETRY_SLEEP"
    sleep "$RETRY_SLEEP"
done
echo "queue5e EXHAUSTED RETRIES $(date -u)"
exit 1
