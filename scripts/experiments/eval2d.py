"""2D evaluation throughput: slice-stacked vs per-slice dispatch.

Round-3 verdict item ("2D evaluation is the least-exercised production
path ... no 2D eval number exists anywhere"). Times whole-volume 2D
inference over a 512x512xZ stack with the 2D flagship V-Net two ways:

* stacked   — `SlidingWindowInference(..., slice_stacked=True)`: the whole
  (Z, H, W, C) stack is ONE jitted dispatch (vnet_tpu/infer/sliding_window.py)
* per_slice — one engine call per slice (the pre-round-3 design, and what
  the reference's 2D evaluator does per feed — evaluate.py:200-263)

JSON lines: {"exp": "eval2d_stacked", "slices_per_s": N, ...}

    python scripts/experiments/eval2d.py --log tmp/exp_2d_eval.log
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

PROBE_FAILED_RC = 42


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--stride", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    args = ap.parse_args()

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    import threading
    got = [0]

    def probe():
        try:
            import jax
            got[0] = len(jax.devices())
        except Exception as e:
            print(f"probe failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(args.probe_timeout)
    if t.is_alive() or not got[0]:
        return PROBE_FAILED_RC

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vnet_tpu.infer import SlidingWindowInference
    from vnet_tpu.models import VNet

    model = VNet(num_classes=args.classes, num_channels=16, num_levels=4,
                 num_convolutions=(1, 2, 3, 3), bottom_convolutions=3,
                 dropout_rate=0.0, activation="prelu", norm="batch",
                 dtype=jnp.bfloat16, conv_impl="packed",
                 packed_target_lanes=128)
    x0 = jnp.zeros((1, args.patch, args.patch, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)
    vs = model.init({"params": rng, "dropout": rng}, x0, train=True)
    variables = {"params": vs["params"], "batch_stats": vs["batch_stats"]}

    def apply_fn(v, patches):
        return model.apply(v, patches, train=False)

    host = np.random.default_rng(0)
    stack = jax.device_put(host.normal(
        size=(args.slices, args.size, args.size, 1)).astype(np.float32))
    float(jnp.sum(stack[0, 0, :4]))

    os.makedirs(os.path.dirname(os.path.abspath(args.log)), exist_ok=True)

    def record(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.log, "a") as f:
            f.write(line + "\n")

    common = dict(patch_shape=(args.patch,) * 2, stride=(args.stride,) * 2,
                  batch_size=args.batch, num_classes=args.classes)

    # --- stacked: one dispatch for the whole stack
    eng = SlidingWindowInference(apply_fn, slice_stacked=True, **common)
    t0 = time.perf_counter()
    acc, w = eng(variables, stack)
    float(jnp.max(jnp.argmax(acc, -1)))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        acc, w = eng(variables, stack)
        float(jnp.max(jnp.argmax(acc, -1)))
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    record({"exp": "eval2d_stacked", "slices_per_s": round(args.slices / med, 2),
            "volume_s": round(med, 3), "compile_s": round(compile_s, 1),
            "size": args.size, "slices": args.slices, "patch": args.patch,
            "stride": args.stride, "batch": args.batch,
            "times_s": [round(x, 3) for x in times]})

    # --- per-slice: one engine call per slice (legacy dispatch pattern)
    eng1 = SlidingWindowInference(apply_fn, **common)
    t0 = time.perf_counter()
    a1, w1 = eng1(variables, stack[0])
    float(jnp.max(jnp.argmax(a1, -1)))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        outs = []
        for z in range(args.slices):
            az, wz = eng1(variables, stack[z])
            outs.append(jnp.max(jnp.argmax(az, -1)))
        float(jnp.max(jnp.stack(outs)))
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    record({"exp": "eval2d_per_slice",
            "slices_per_s": round(args.slices / med, 2),
            "volume_s": round(med, 3), "compile_s": round(compile_s, 1),
            "size": args.size, "slices": args.slices, "patch": args.patch,
            "stride": args.stride, "batch": args.batch,
            "times_s": [round(x, 3) for x in times]})
    return 0


if __name__ == "__main__":
    sys.exit(main())
