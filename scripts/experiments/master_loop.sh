#!/bin/bash
# Round-3 TPU measurement queue (VERDICT.md "Next round" items 1-6).
#
# Runs each stage once, marking success with tmp/done_<stage>; on tunnel
# failure (probe rc 42 / timeouts) sleeps and retries the remaining
# stages. Safe to re-run — finished stages are skipped. Launch:
#
#   nohup bash scripts/experiments/master_loop.sh > tmp/master_loop.log 2>&1 &
#   echo $! > tmp/master_loop.pid
#
# Stage order = verdict priority: train A/B matrix -> land winner ->
# bench (warms the driver's compile cache) -> quality run -> dense
# inference -> attention -> 2D eval.
set -u
cd "$(dirname "$0")/../.."
mkdir -p tmp

RETRY_SLEEP=${RETRY_SLEEP:-180}
STAGE_TIMEOUT=${STAGE_TIMEOUT:-10800}

run_stage() {  # run_stage <name> <cmd...>
    local name=$1; shift
    [ -f "tmp/done_$name" ] && return 0
    echo "=== stage $name START $(date -u +%H:%M:%S) ==="
    timeout "$STAGE_TIMEOUT" "$@" >> "tmp/stage_$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
        touch "tmp/done_$name"
        echo "=== stage $name OK $(date -u +%H:%M:%S) ==="
    else
        echo "=== stage $name rc=$rc $(date -u +%H:%M:%S) ==="
    fi
    return $rc
}

for iter in $(seq 1 40); do
    echo "--- queue pass $iter $(date -u) ---"

    run_stage r2b python scripts/experiments/ab_train.py --log tmp/exp_r2b.log \
        base_b96_k4 nodrop_b96_k4 pdrop_b96_k4 flatadam_b96_k4 \
        combo_pdrop_flatadam_b96_k4
    run_stage r2e python scripts/experiments/ab_train.py --log tmp/exp_r2e.log \
        cdw_b96_k4 cdw_flatadam_b96_k4 cdw_all_b96_k4

    if [ -f tmp/done_r2b ] && [ -f tmp/done_r2e ]; then
        run_stage select python scripts/select_bench_tuning.py
    fi
    if [ -f tmp/done_select ]; then
        run_stage bench python bench.py
    fi

    run_stage quality python scripts/quickstart.py --steps 600 \
        --workdir tmp/quality
    run_stage inf32_xla python scripts/benchmark_eval.py --stride 32 \
        --batch 128 --reps 3
    run_stage inf32_pallas python scripts/benchmark_eval.py --stride 32 \
        --batch 128 --reps 3 --blend-impl pallas
    run_stage attn python scripts/experiments/attention_step.py \
        --log tmp/exp_attn.log
    run_stage eval2d python scripts/experiments/eval2d.py \
        --log tmp/exp_2d_eval.log

    need=0
    for s in r2b r2e select bench quality inf32_xla inf32_pallas attn eval2d; do
        [ -f "tmp/done_$s" ] || need=1
    done
    if [ $need -eq 0 ]; then
        echo "--- queue COMPLETE $(date -u) ---"
        exit 0
    fi
    echo "--- pass $iter incomplete; sleeping $RETRY_SLEEP s ---"
    sleep "$RETRY_SLEEP"
done
echo "--- queue gave up after 40 passes $(date -u) ---"
exit 1
