"""Benchmark: training throughput of the flagship 3D V-Net at 64^3 patches.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric matches BASELINE.json: training patches/sec/chip at 64^3 on the
reference network configuration (V-Net, 16 channels, 4 levels, convs
(1,2,3,3), bottom 3, PReLU, batch norm, Adam + weighted sorensen —
configs/config.json:18-46 of the reference). Runs the optimized production
path: adaptive per-level space-to-depth packing (packed_target_lanes=128:
each level packs only enough axes to fill the MXU's 128 lanes, cutting
the packing FLOP tax at deep levels — BENCHMARKS.md exp9/exp11), bf16
compute, rbg dropout keys, and a 4-step lax.scan per dispatch at batch 96
(the Trainer's ScanSteps mode; measured optimum of the batch/scan sweep).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
ratio is computed against REFERENCE_TF1_PATCHES_PER_SEC — a documented
estimate of the TF1 1.15 single-GPU reference at the same 64^3 workload
(~V-Net fwd+bwd + per-step feed_dict host round trip on a V100-16GB).

Sync note: through this environment's remote TPU tunnel, only a scalar
host transfer (float(loss)) reliably waits for device completion.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

REFERENCE_TF1_PATCHES_PER_SEC = 25.0  # documented estimate, see docstring


def _run():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vnet_tpu.models import VNet
    from vnet_tpu.ops.losses import segmentation_loss

    # env overrides exist for CPU smoke-driving only; the driver runs the
    # production defaults
    side = int(os.environ.get("VNET_BENCH_PATCH", 64))
    patch = (side, side, side)
    batch = int(os.environ.get("VNET_BENCH_BATCH", 96))
    scan_k = int(os.environ.get("VNET_BENCH_SCAN", 4))
    # A/B knobs for the round-2 non-conv levers (tmp/exp_r2b.py measures
    # the same variants); defaults are the production configuration
    dropout_impl = os.environ.get("VNET_BENCH_DROPOUT_IMPL", "xla")
    opt_name = os.environ.get("VNET_BENCH_OPT", "adam")  # adam | fused
    num_classes = 3  # reference config.json: classes [0,1,2]
    weights = (0.01, 0.1, 1.0)

    model = VNet(num_classes=num_classes, num_channels=16, num_levels=4,
                 num_convolutions=(1, 2, 3, 3), bottom_convolutions=3,
                 dropout_rate=0.01, activation="prelu", norm="batch",
                 dtype=jnp.bfloat16, conv_impl="packed",
                 packed_target_lanes=128, dropout_impl=dropout_impl)

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

    # donated carry: in-place parameter/optimizer updates (matches the
    # Trainer's jit; measured +0.8% and halves state memory)
    @partial(jax.jit, donate_argnums=(0,))
    def run_block(carry, keys):
        carry, losses = jax.lax.scan(train_step, carry, keys)
        return carry, losses[-1]

    key = jax.random.key(1, impl="rbg")
    carry = (variables["params"], variables["batch_stats"],
             tx.init(variables["params"]))

    carry, loss = run_block(carry, jax.random.split(key, scan_k))
    float(loss)  # compile + full sync

    # median over blocks: the tunnel adds occasional multi-second stalls
    # that would corrupt a single aggregate timing
    times = []
    for i in range(int(os.environ.get("VNET_BENCH_REPS", 5))):
        t0 = time.perf_counter()
        carry, loss = run_block(
            carry, jax.random.split(jax.random.fold_in(key, i), scan_k))
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    n_chips = max(len(jax.devices()), 1)
    patches_per_sec_per_chip = (batch * scan_k) / dt / n_chips

    print(json.dumps({
        "metric": "train_patches_per_sec_per_chip_64cube_vnet",
        "value": round(patches_per_sec_per_chip, 3),
        "unit": "patches/s/chip",
        "vs_baseline": round(
            patches_per_sec_per_chip / REFERENCE_TF1_PATCHES_PER_SEC, 3),
    }))


def main():
    # the remote-TPU tunnel occasionally drops a run with a transient
    # UNAVAILABLE/FAILED_PRECONDITION; a fresh attempt recompiles from the
    # server-side cache in ~minutes, so retrying the whole run is cheap
    # insurance for the recorded metric. Deterministic failures repeat and
    # surface after the last attempt.
    attempts = int(os.environ.get("VNET_BENCH_ATTEMPTS", 3))
    for i in range(attempts):
        try:
            return _run()
        except KeyboardInterrupt:
            raise
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"bench attempt {i + 1} failed "
                  f"({type(e).__name__}: {str(e)[:200]}); retrying",
                  file=sys.stderr, flush=True)
            time.sleep(30)


if __name__ == "__main__":
    sys.exit(main())
