#!/bin/bash
# Round-5 TPU quality queue (VERDICT round-4 items 1-3, 7):
#
#   q2d   — 2D-family quality at the 2D-calibrated contrast (2.0 sigma:
#           per-slice oracle ceiling ~[0.88, 0.86]; 0.6 proven unpassable
#           — BENCHMARKS.md round-5 2D diagnosis), full 2D augmentation
#           arsenal, slice-cache fix in.
#   attn  — attention-gated V-Net quality (the 4e runbook): bits8 HBM-fit
#           test + 6000-step train + dual EMA/batch_stats eval.
#   qmm   — multimodal fusion quality, quality3 recipe, DeviceAugment
#           (host does decode+crop only — the round-4 run starved).
#   q3s2  — quality3 reproducibility at a second seed (VERDICT item 7).
#   bench — bench.py pass to re-warm the driver's compile cache.
#
# Each stage runs in its own child process (server-side RESOURCE_EXHAUSTED
# accumulates otherwise), is resumable from orbax checkpoints, and is
# retried across passes (tunnel can drop for hours — bounded loop).
#
#   nohup bash scripts/experiments/master_loop5.sh > tmp/master_loop5.log 2>&1 &
#   echo $! > tmp/master_loop5.pid
set -u
cd "$(dirname "$0")/../.." || exit 1
mkdir -p tmp records/round5

RETRY_SLEEP=${RETRY_SLEEP:-120}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    [ -f "tmp/done5_$name" ] && return 0
    echo "=== stage $name START $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@" >> "tmp/stage5_$name.log" 2>&1
    local rc=$?
    # copy the log out of volatile tmp/ after EVERY attempt (VM resets
    # have eaten results twice; records/ is committed)
    cp "tmp/stage5_$name.log" "records/round5/stage5_$name.log" 2>/dev/null
    if [ $rc -eq 0 ]; then
        touch "tmp/done5_$name"
        echo "=== stage $name OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== stage $name rc=$rc $(date -u +%H:%M:%S) ==="
    fi
    return $rc
}

for iter in $(seq 1 8); do
    echo "--- queue5 pass $iter $(date -u) ---"

    run_stage q2d 4500 python scripts/quickstart.py --rank2 \
        --steps 3000 --workdir tmp/r5_q2d \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    run_stage attn 10800 python scripts/experiments/attn_quality.py \
        --workdir tmp/r5_attn --steps 6000

    run_stage qmm 10800 python scripts/quickstart.py --multimodal \
        --steps 6000 --workdir tmp/r5_qmm \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    run_stage q3s2 10800 python scripts/quickstart.py \
        --steps 6000 --workdir tmp/r5_q3s2 --seed 1337 \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    if [ -f tmp/done5_q2d ] && [ -f tmp/done5_attn ] && \
       [ -f tmp/done5_qmm ] && [ -f tmp/done5_q3s2 ]; then
        run_stage bench 1800 python bench.py
    fi

    need=0
    for s in q2d attn qmm q3s2 bench; do
        [ -f "tmp/done5_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "queue5 COMPLETE $(date -u)"
        exit 0
    fi
    echo "pass $iter incomplete; sleeping $RETRY_SLEEP"
    sleep "$RETRY_SLEEP"
done
echo "queue5 EXHAUSTED RETRIES $(date -u)"
exit 1
