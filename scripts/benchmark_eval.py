"""Whole-volume inference benchmark: 512^3 sliding window latency.

The second headline metric (BASELINE.json: "<2 s per 512^3 CT volume").
Methodology notes (BENCHMARKS.md): the volume is made device-resident
before timing (host->device transfer is hardware-/tunnel-dependent and
reported separately), and sync is a scalar host fetch.

    python scripts/benchmark_eval.py [--size 512] [--stride 64] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--stride", type=int, default=64)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--classes", type=int, default=3)
    p.add_argument("--gaussian", action="store_true")
    p.add_argument("--blend-impl", default="xla", choices=["xla", "pallas"])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

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
    x0 = jnp.zeros((1, args.patch, args.patch, args.patch, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)
    vs = model.init({"params": rng, "dropout": rng}, x0, train=True)
    variables = {"params": vs["params"], "batch_stats": vs["batch_stats"]}

    def apply_fn(v, patches):
        return model.apply(v, patches, train=False)

    engine = SlidingWindowInference(
        apply_fn, (args.patch,) * 3, (args.stride,) * 3, args.batch,
        args.classes, gaussian_blend=args.gaussian,
        blend_impl=args.blend_impl)

    host = np.random.default_rng(0)
    t0 = time.perf_counter()
    vol = jax.device_put(
        host.normal(size=(args.size,) * 3 + (1,)).astype(np.float32))
    float(jnp.sum(vol[0, 0, 0]))
    print(f"host->device transfer: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    acc, w = engine(variables, vol)
    float(jnp.sum(w))
    print(f"first call (compile + run): {time.perf_counter() - t0:.2f}s")

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        acc, w = engine(variables, vol)
        label = jnp.argmax(acc, -1)
        float(jnp.max(label))
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    n = len(engine._compiled)
    print(f"{args.size}^3 sliding window stride={args.stride} "
          f"batch={args.batch} gaussian={args.gaussian} "
          f"blend={args.blend_impl}: "
          f"median {med:.2f}s over {args.reps} reps")


if __name__ == "__main__":
    main()
