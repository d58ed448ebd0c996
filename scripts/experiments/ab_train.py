"""TPU A/B matrix for the production training step (round-3 queue).

Measures the flagship V-Net train step (64^3 patches, bf16, adaptive
lanes-128 packing — same harness as bench.py) under each perf-lever /
tuning combination and appends one JSON line per variant to --log:

    {"exp": TAG, "patches_per_s": N, "step_ms": N, "compile_s": N, ...}

Tags match scripts/select_bench_tuning.py's TAG_TO_TUNING so the
selector can land the winner in configs/bench_tuning.json unattended.
``nodrop_b96_k4`` is a diagnostic upper bound (dropout off), not a
landable configuration.

Isolation: each tag runs in its OWN child process. Round-3 pass 1 showed
that after two variants in one process the third dies with
RESOURCE_EXHAUSTED (server-side HBM held by the previous executables'
donated buffers/fragmentation) — flatadam failed after base+nodrop in
tmp/stage_r2b.log while the identical knob ran fine as cdw_flatadam in a
fresher process. A fresh process per tag pays one backend claim each but
compiles are server-side cached.

Idempotent: tags already recorded in --log are skipped, so the outer
retry loop (scripts/experiments/master_loop.sh) can re-run the same
command after a partial failure and only the missing variants run.

Large batches: the tunnel rejects single requests >~128 MB (HTTP 413 —
observed at b128: one f32 image tensor is 134 MB). Host data is staged
in <=64 MB device_put chunks and concatenated on-device, so b112/b128
variants can be measured at all.

Run ON the TPU (the parent never claims the backend; children do):

    nohup python scripts/experiments/ab_train.py --log tmp/exp_r2b.log \
        base_b96_k4 nodrop_b96_k4 pdrop_b96_k4 flatadam_b96_k4 \
        combo_pdrop_flatadam_b96_k4 &

Exit code 42 = backend init hung/failed in a child (outer retry loop
should wait and relaunch; see master_loop.sh).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

PROBE_FAILED_RC = 42

_BASE = dict(rate=0.01, impl="xla", opt="adam", dw="xla", batch=96,
             scan=4)


def _v(**kw):
    d = dict(_BASE)
    d.update(kw)
    return d


VARIANTS = {
    "base_b96_k4": _v(),
    "nodrop_b96_k4": _v(rate=0.0),
    "pdrop_b96_k4": _v(impl="pallas"),
    "flatadam_b96_k4": _v(opt="fused"),
    "combo_pdrop_flatadam_b96_k4": _v(impl="pallas", opt="fused"),
    "cdw_b96_k4": _v(dw="custom"),
    "cdw_flatadam_b96_k4": _v(dw="custom", opt="fused"),
    "cdw_all_b96_k4": _v(dw="custom", opt="fused", impl="pallas"),
    # round-3 additions: dispatch-amortization and batch-size probes
    "base_b96_k8": _v(scan=8),
    "base_b96_k16": _v(scan=16),
    "base_b112_k4": _v(batch=112),
    "base_b128_k4": _v(batch=128),
    # uint8 rng mask (4x less dropout-mask HBM traffic, no fusion barrier)
    "drop8_b96_k4": _v(impl="bits8"),
    "drop8_b96_k16": _v(impl="bits8", scan=16),
    # round-4: scan frontier past the landed k16, and batch probes AT the
    # landed scan (base_b96_k16 = 210.57 p/s is the comparator)
    "base_b96_k24": _v(scan=24),
    "base_b96_k32": _v(scan=32),
    "base_b112_k16": _v(batch=112, scan=16),
    "base_b128_k16": _v(batch=128, scan=16),
    # round-5: Pallas dW kernel (ops/pallas/dw_conv.py) vs the landed
    # bits8+scan16 config -- the last route to the >=240 p/s north star
    # (30.8 ms/step of XLA dW layout copies, BENCHMARKS.md round-4)
    "pdw_b96_k16": _v(dw="pallas", impl="bits8", scan=16),
    "drop8_base_b96_k16": _v(impl="bits8", scan=16),
    # round-5: permanently-flat optimizer state (optim.FlatAdamCarry) —
    # the only route to the 13.5 ms per-tensor optimizer tail
    "flatstate_b96_k16": _v(opt="flat", impl="bits8", scan=16),
    # CPU end-to-end smoke of the harness itself (not landable)
    "smoke_b2_k1": _v(batch=2, scan=1),
    "smoke_flat_b2_k1": _v(opt="flat", batch=2, scan=1),
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


def _device_put_chunked(arr, max_bytes=64 << 20):
    """Stage a host array on-device in <=max_bytes transfers (the tunnel
    rejects single requests >~128 MB — vnet_tpu/utils/staging.py)."""
    from vnet_tpu.utils.staging import device_put_chunked
    return device_put_chunked(arr, max_bytes)


def measure(tag: str, side: int, reps: int, trace_dir: str | None = None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vnet_tpu.models import VNet
    from vnet_tpu.ops.losses import segmentation_loss

    v = VARIANTS[tag]
    batch, scan_k = v["batch"], v["scan"]
    patch = (side, side, side)
    num_classes = 3
    weights = (0.01, 0.1, 1.0)

    model = VNet(num_classes=num_classes, num_channels=16, num_levels=4,
                 num_convolutions=(1, 2, 3, 3), bottom_convolutions=3,
                 dropout_rate=v["rate"], activation="prelu", norm="batch",
                 dtype=jnp.bfloat16, conv_impl="packed",
                 packed_target_lanes=128, dropout_impl=v["impl"],
                 dw_impl=v["dw"])

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, *patch, 1), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    schedule = optax.exponential_decay(1e-2, 100, 0.99)
    if v["opt"] == "fused":
        from vnet_tpu.train.optim import fused_adam
        tx = fused_adam(schedule)
    else:
        tx = optax.adam(schedule)

    host = np.random.default_rng(0)
    images = _device_put_chunked(
        host.normal(size=(batch, *patch, 1)).astype(np.float32))
    labels = _device_put_chunked(
        host.integers(0, num_classes, size=(batch, *patch)).astype(np.int32))

    def loss_of(p, batch_stats, step_rng):
        out, mutated = model.apply(
            {"params": p, "batch_stats": batch_stats}, images, train=True,
            rngs={"dropout": step_rng}, mutable=["batch_stats"])
        loss, _ = segmentation_loss(out, labels, name="weighted_sorensen",
                                    num_classes=num_classes,
                                    weights=weights)
        return loss, mutated["batch_stats"]

    if v["opt"] == "flat":
        # permanently-flat train state (optim.py FlatAdamCarry): grads
        # arrive flat from the vjp, Adam runs flat, params stay flat —
        # the repack that nulled fused_adam's win never happens
        from vnet_tpu.train.optim import flat_adam_init, flat_adam_step

        fc0, unravel = flat_adam_init(variables["params"])

        def train_step(carry, step_rng):
            fc, batch_stats = carry
            (loss, new_bs), gflat = jax.value_and_grad(
                lambda pf: loss_of(unravel(pf), batch_stats, step_rng),
                has_aux=True)(fc.flat)
            return (flat_adam_step(fc, gflat, schedule), new_bs), loss

        carry0 = (fc0, variables["batch_stats"])
    else:
        def train_step(carry, step_rng):
            params, batch_stats, opt_state = carry
            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params, batch_stats, step_rng)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs,
                    new_opt), loss

        carry0 = (variables["params"], variables["batch_stats"],
                  tx.init(variables["params"]))

    @partial(jax.jit, donate_argnums=(0,))
    def run_block(carry, keys):
        carry, losses = jax.lax.scan(train_step, carry, keys)
        return carry, losses[-1]

    key = jax.random.key(1, impl="rbg")
    carry = carry0

    t0 = time.perf_counter()
    carry, loss = run_block(carry, jax.random.split(key, scan_k))
    float(loss)  # compile + full sync (scalar fetch is the only honest sync)
    compile_s = time.perf_counter() - t0

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        carry, loss = run_block(
            carry, jax.random.split(jax.random.fold_in(key, i), scan_k))
        float(loss)
        times.append(time.perf_counter() - t0)
    if trace_dir:
        jax.profiler.stop_trace()
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


def _logged_tags(log_path: str):
    tags = set()
    if not os.path.exists(log_path):
        return tags
    for line in open(log_path):
        line = line.strip()
        if not (line.startswith("{") and "patches_per_s" in line):
            continue
        try:
            tags.add(json.loads(line).get("exp"))
        except ValueError:
            continue
    return tags


def _run_inproc(args):
    """Child mode: claim the backend, measure ONE tag, append to --log."""
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

    tag = args.tags[0]
    rec = None
    for attempt in range(2):
        try:
            rec = measure(tag, args.side, args.reps)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            print(f"{tag} attempt {attempt + 1} failed "
                  f"({type(e).__name__}: {str(e)[:300]})",
                  file=sys.stderr, flush=True)
            # OOM poisons the process (server-side HBM stays held) — only
            # transient errors are worth a same-process retry
            if attempt == 0 and "RESOURCE_EXHAUSTED" not in str(e):
                time.sleep(30)
                continue
            return 1
        break
    line = json.dumps(rec)
    print(line, flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.log)), exist_ok=True)
    with open(args.log, "a") as f:
        f.write(line + "\n")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="+", choices=sorted(VARIANTS))
    ap.add_argument("--log", required=True)
    ap.add_argument("--side", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--child-timeout", type=float, default=2700.0)
    ap.add_argument("--inproc", action="store_true",
                    help="child mode: measure exactly one tag in-process")
    args = ap.parse_args()

    if args.inproc:
        if len(args.tags) != 1:
            ap.error("--inproc takes exactly one tag")
        return _run_inproc(args)

    done = _logged_tags(args.log)
    todo = [t for t in args.tags if t not in done]
    for t in args.tags:
        if t in done:
            print(f"{t}: already in {args.log}; skipping", flush=True)
    if not todo:
        print("all requested tags already measured", flush=True)
        return 0

    failures = 0
    timeouts = 0
    for tag in todo:
        cmd = [sys.executable, os.path.abspath(__file__), tag,
               "--log", args.log, "--side", str(args.side),
               "--reps", str(args.reps),
               "--probe-timeout", str(args.probe_timeout), "--inproc"]
        try:
            rc = subprocess.run(cmd, timeout=args.child_timeout).returncode
        except subprocess.TimeoutExpired:
            # a mid-run hang is the tunnel dropping AFTER the init probe —
            # transient, not a property of the variant
            print(f"{tag}: child exceeded {args.child_timeout:.0f} s; killed",
                  file=sys.stderr, flush=True)
            timeouts += 1
            continue
        if rc == PROBE_FAILED_RC:
            # tunnel down — no point trying the remaining tags now
            return PROBE_FAILED_RC
        if rc != 0:
            failures += 1
    if failures:
        return 1
    # all hard work succeeded or was skipped; report timeouts as the
    # transient rc so outer loops sleep-and-retry instead of burning a try
    return PROBE_FAILED_RC if timeouts else 0


if __name__ == "__main__":
    sys.exit(main())
