"""TPU A/B matrix for the production training step (round-3 queue).

Measures the flagship V-Net train step (64^3 patches, b96 k4 scan,
bf16, adaptive lanes-128 packing — same harness as bench.py) under each
perf-lever combination and appends one JSON line per variant to --log:

    {"exp": TAG, "patches_per_s": N, "step_ms": N, "compile_s": N, ...}

Tags match scripts/select_bench_tuning.py's TAG_TO_TUNING so the
selector can land the winner in configs/bench_tuning.json unattended.
``nodrop_b96_k4`` is a diagnostic upper bound (dropout off), not a
landable configuration.

Run ON the TPU (one process claims the backend once; remote compiles
are server-side cached):

    nohup python scripts/experiments/ab_train.py --log tmp/exp_r2b.log \
        base_b96_k4 nodrop_b96_k4 pdrop_b96_k4 flatadam_b96_k4 \
        combo_pdrop_flatadam_b96_k4 &

Exit code 42 = backend init hung/failed (outer retry loop should wait
and relaunch; see scripts/experiments/master_loop.sh).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

PROBE_FAILED_RC = 42

VARIANTS = {
    # tag -> (dropout_rate, dropout_impl, opt, custom_dw)
    "base_b96_k4": (0.01, "xla", "adam", False),
    "nodrop_b96_k4": (0.0, "xla", "adam", False),
    "pdrop_b96_k4": (0.01, "pallas", "adam", False),
    "flatadam_b96_k4": (0.01, "xla", "fused", False),
    "combo_pdrop_flatadam_b96_k4": (0.01, "pallas", "fused", False),
    "cdw_b96_k4": (0.01, "xla", "adam", True),
    "cdw_flatadam_b96_k4": (0.01, "xla", "fused", True),
    "cdw_all_b96_k4": (0.01, "pallas", "fused", True),
}


def _bounded_device_probe(timeout_s: float):
    import threading

    result = [0]

    def probe():
        try:
            import jax
            result[0] = len(jax.devices())
        except Exception as e:
            print(f"probe: backend init failed ({type(e).__name__}: "
                  f"{str(e)[:200]})", file=sys.stderr, flush=True)
            result[0] = 0

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return None if t.is_alive() else result[0]


def measure(tag: str, batch: int, scan_k: int, side: int, reps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vnet_tpu.models import VNet
    from vnet_tpu.ops.losses import segmentation_loss

    dropout_rate, dropout_impl, opt_name, custom_dw = VARIANTS[tag]
    patch = (side, side, side)
    num_classes = 3
    weights = (0.01, 0.1, 1.0)

    model = VNet(num_classes=num_classes, num_channels=16, num_levels=4,
                 num_convolutions=(1, 2, 3, 3), bottom_convolutions=3,
                 dropout_rate=dropout_rate, activation="prelu", norm="batch",
                 dtype=jnp.bfloat16, conv_impl="packed",
                 packed_target_lanes=128, dropout_impl=dropout_impl,
                 custom_dw=custom_dw)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, *patch, 1), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    schedule = optax.exponential_decay(1e-2, 100, 0.99)
    if opt_name == "fused":
        from vnet_tpu.train.optim import fused_adam
        tx = fused_adam(schedule)
    else:
        tx = optax.adam(schedule)

    host = np.random.default_rng(0)
    images = jnp.asarray(host.normal(size=(batch, *patch, 1)).astype(np.float32))
    labels = jnp.asarray(host.integers(0, num_classes,
                                       size=(batch, *patch)).astype(np.int32))

    def train_step(carry, step_rng):
        params, batch_stats, opt_state = carry

        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                rngs={"dropout": step_rng}, mutable=["batch_stats"])
            loss, _ = segmentation_loss(out, labels, name="weighted_sorensen",
                                        num_classes=num_classes,
                                        weights=weights)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt), loss

    @partial(jax.jit, donate_argnums=(0,))
    def run_block(carry, keys):
        carry, losses = jax.lax.scan(train_step, carry, keys)
        return carry, losses[-1]

    key = jax.random.key(1, impl="rbg")
    carry = (variables["params"], variables["batch_stats"],
             tx.init(variables["params"]))

    t0 = time.perf_counter()
    carry, loss = run_block(carry, jax.random.split(key, scan_k))
    float(loss)  # compile + full sync (scalar fetch is the only honest sync)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        carry, loss = run_block(
            carry, jax.random.split(jax.random.fold_in(key, i), scan_k))
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return {
        "exp": tag,
        "patches_per_s": round(batch * scan_k / dt, 3),
        "step_ms": round(dt / scan_k * 1000, 2),
        "compile_s": round(compile_s, 1),
        "batch": batch, "scan": scan_k, "side": side,
        "times_s": [round(t, 4) for t in times],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="+", choices=sorted(VARIANTS))
    ap.add_argument("--log", required=True)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--side", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    args = ap.parse_args()

    # sitecustomize points jax at the tunneled TPU via config.update at
    # interpreter start; for CPU smoke runs the env var alone does not win.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    n = _bounded_device_probe(args.probe_timeout)
    if not n:
        state = "hung" if n is None else "failed"
        print(f"backend init {state}; rc {PROBE_FAILED_RC}",
              file=sys.stderr, flush=True)
        return PROBE_FAILED_RC

    os.makedirs(os.path.dirname(os.path.abspath(args.log)), exist_ok=True)
    failures = 0
    for tag in args.tags:
        for attempt in range(3):
            try:
                rec = measure(tag, args.batch, args.scan, args.side, args.reps)
            except KeyboardInterrupt:
                raise
            except Exception as e:
                print(f"{tag} attempt {attempt + 1} failed "
                      f"({type(e).__name__}: {str(e)[:300]})",
                      file=sys.stderr, flush=True)
                if attempt == 2:
                    failures += 1
                    rec = None
                else:
                    time.sleep(30)
                    continue
            break
        if rec is None:
            continue
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.log, "a") as f:
            f.write(line + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
