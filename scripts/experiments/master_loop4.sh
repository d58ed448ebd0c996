#!/bin/bash
# Round-4 revival queue: the VM reset (Aug 19 ~21:37 UTC) killed the
# in-flight session4e/f/g quality queues and wiped tmp/ (logs, orbax
# checkpoints, pid files). This queue re-runs the two runs that fit the
# remaining wall-clock, fastest first:
#
#   q2d  — 2D-family quality: quickstart --rank2 on the hard synthetic
#          (NiftiDataset2D slice inventory -> whole-slice 96^2 patches ->
#          slice-stacked evaluator -> 3D per-class Dice), quality3 recipe
#          (64 cases, augment, drop 0.3 / min_pixel 32).
#   qmm  — multimodal quality: quickstart --multimodal (2-channel fusion
#          task: each foreground class separable in exactly one channel),
#          same recipe, 3D flagship regime.
#   bench — one bench.py pass to re-warm the driver's server-side compile
#          cache near round end.
#
# The attention-VNet quality run (old 4e) does NOT fit this window
# (attention 64^3 cold compiles alone measured 258-658 s, plus 3000
# steps at ~460 ms) — recorded as lost-to-reset in BENCHMARKS.md, NOT
# marked done here. Round-5 item.
#
#   nohup bash scripts/experiments/master_loop4.sh > tmp/master_loop4.log 2>&1 &
#   echo $! > tmp/master_loop4.pid
set -u
cd "$(dirname "$0")/../.." || exit 1
mkdir -p tmp

RETRY_SLEEP=${RETRY_SLEEP:-90}
Q2D_STEPS=${Q2D_STEPS:-4000}
QMM_STEPS=${QMM_STEPS:-6000}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    [ -f "tmp/done4_$name" ] && return 0
    echo "=== stage $name START $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@" >> "tmp/stage4_$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
        touch "tmp/done4_$name"
        echo "=== stage $name OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== stage $name rc=$rc $(date -u +%H:%M:%S) ==="
    fi
    return $rc
}

for iter in $(seq 1 6); do
    echo "--- queue4 revival pass $iter $(date -u) ---"

    # 2D family quality. Restore=True semantics: quickstart reuses the
    # workdir's dataset + checkpoints, so a pass that dies mid-run
    # resumes rather than restarting.
    run_stage q2d 2400 python scripts/quickstart.py --rank2 \
        --steps "$Q2D_STEPS" --workdir tmp/quality2d \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    # Multimodal fusion quality (3D flagship regime, quality3 recipe).
    run_stage qmm 3600 python scripts/quickstart.py --multimodal \
        --steps "$QMM_STEPS" --workdir tmp/qualitymm \
        --n-train 64 --augment --drop-ratio 0.3 --min-pixel 32

    # Re-warm the driver's bench compile cache once the chip is free.
    if [ -f tmp/done4_q2d ] && [ -f tmp/done4_qmm ]; then
        run_stage bench 1200 python bench.py
    fi

    need=0
    for s in q2d qmm bench; do
        [ -f "tmp/done4_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "queue4 revival COMPLETE $(date -u)"
        exit 0
    fi
    echo "pass $iter incomplete; sleeping $RETRY_SLEEP"
    sleep "$RETRY_SLEEP"
done
echo "queue4 revival EXHAUSTED RETRIES $(date -u)"
exit 1
