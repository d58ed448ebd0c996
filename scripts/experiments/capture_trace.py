"""Capture a fresh device trace of one A/B train-step variant.

Round-3 diagnostic: the round-1 trace (tmp/trace_b96_cap1024) attributed
~31 ms/step to dW layout copies and ~13 ms to per-tensor optimizer ops,
but the levers built against those numbers (CustomDw, FusedAdam) measured
NEUTRAL on the chip (tmp/exp_r2b.log / exp_r2e.log). This recaptures the
breakdown at the current production step so the next optimization targets
what the hardware actually spends time on.

    python scripts/experiments/capture_trace.py base_b96_k4 \
        --trace-dir tmp/trace_r3 [--side 64] [--reps 2]

Analyze with: python scripts/analyze_trace.py tmp/trace_r3 --group
Exit code 42 = backend init hung/failed (retry later).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import ab_train  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=sorted(ab_train.VARIANTS))
    ap.add_argument("--trace-dir", required=True)
    ap.add_argument("--side", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    args = ap.parse_args()

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    n = ab_train._bounded_device_probe(args.probe_timeout)
    if not n:
        return ab_train.PROBE_FAILED_RC

    os.makedirs(args.trace_dir, exist_ok=True)
    rec = ab_train.measure(args.tag, args.side, args.reps,
                           trace_dir=args.trace_dir)
    import json
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
