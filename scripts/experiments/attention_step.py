"""Attention-gated V-Net on-chip step timing (round-3 verdict item 5).

The remote compile helper crashes (HTTP 500) on the attention-VNet
fwd+bwd graph at 64^3 without remat — so this script walks a list of
(side, batch, remat) configs from most- to least-ambitious, records every
config that compiles + runs, and keeps going past ones that crash. One
JSON line per successful config:

    {"exp": "attn_s48_b8", "patches_per_s": N, "step_ms": N, ...}

Reference feature: /root/reference/train.py:281-310 (attention gate +
distance-map loss). Loss here matches the reference combo: segmentation
weighted_sorensen + 100 * l2 distance-map loss on the attention logits.

    python scripts/experiments/attention_step.py --log tmp/exp_attn.log
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

# (tag, side, batch, remat) — most ambitious first; 64^3 no-remat is the
# known-crashing config, included so the log records its failure mode.
CONFIGS = [
    ("attn_s64_b8_remat", 64, 8, True),
    ("attn_s64_b16_remat", 64, 16, True),
    ("attn_s48_b8", 48, 8, False),
    ("attn_s48_b8_remat", 48, 8, True),
    ("attn_s64_b8", 64, 8, False),
]


def measure(side: int, batch: int, remat: bool, reps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vnet_tpu.models.attention import (AttentionGatedVNet,
                                           attention_distance_loss)
    from vnet_tpu.ops.losses import segmentation_loss

    num_classes = 2  # legacy trainer is binary (train.py:271-310)
    model = AttentionGatedVNet(num_classes=num_classes, num_channels=16,
                               num_levels=4, num_convolutions=(1, 2, 3, 3),
                               bottom_convolutions=3, dropout_rate=0.01,
                               activation="prelu", norm="batch",
                               dtype=jnp.bfloat16, conv_impl="packed",
                               packed_target_lanes=128, remat=remat)

    rng = jax.random.PRNGKey(0)
    patch = (side,) * 3
    x = jnp.zeros((batch, *patch, 1), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    tx = optax.adam(1e-3)

    host = np.random.default_rng(0)
    images = jnp.asarray(host.normal(size=(batch, *patch, 1)).astype(np.float32))
    labels = jnp.asarray(host.integers(0, num_classes,
                                       size=(batch, *patch)).astype(np.int32))
    dist = jnp.asarray(host.random(size=(batch, *patch)).astype(np.float32))

    def train_step(carry, step_rng):
        params, batch_stats, opt_state = carry

        def loss_fn(p):
            (logits, att), mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, images, train=True,
                rngs={"dropout": step_rng}, mutable=["batch_stats"])
            seg, _ = segmentation_loss(logits, labels,
                                       name="weighted_sorensen",
                                       num_classes=num_classes,
                                       weights=(0.1, 1.0))
            att_l = attention_distance_loss(att, dist, kind="l2")
            return seg + att_l, mutated["batch_stats"]

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
    scan_k = 2

    t0 = time.perf_counter()
    carry, loss = run_block(carry, jax.random.split(key, scan_k))
    float(loss)
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
        "patches_per_s": round(batch * scan_k / dt, 3),
        "step_ms": round(dt / scan_k * 1000, 2),
        "compile_s": round(compile_s, 1),
        "batch": batch, "side": side, "remat": remat,
        "times_s": [round(t, 4) for t in times],
    }


def _configs(smoke: bool):
    return ([("attn_smoke", 16, 1, False), ("attn_smoke_remat", 16, 1, True)]
            if smoke else CONFIGS)


def _logged_tags(log_path):
    """Tags already recorded (success OR error) — both are terminal: a
    config that crashed the compile helper will crash again."""
    tags = set()
    if not os.path.exists(log_path):
        return tags
    for line in open(log_path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            tags.add(json.loads(line).get("exp"))
        except ValueError:
            continue
    return tags


def _probe(timeout_s):
    import threading
    result = [0]

    def probe():
        try:
            import jax
            result[0] = len(jax.devices())
        except Exception as e:
            print(f"probe failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return 0 if t.is_alive() else result[0]


def _run_inproc(args):
    """Child mode: measure exactly ONE config, append success or error."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    if not _probe(args.probe_timeout):
        return PROBE_FAILED_RC

    by_tag = {c[0]: c for c in _configs(args.smoke)}
    tag, side, batch, remat = by_tag[args.only[0]]
    try:
        rec = {"exp": tag, **measure(side, batch, remat, args.reps)}
        ok = True
    except KeyboardInterrupt:
        raise
    except Exception as e:
        rec = {"exp": tag, "error": f"{type(e).__name__}: {str(e)[:300]}",
               "batch": batch, "side": side, "remat": remat}
        ok = False
    line = json.dumps(rec)
    print(line, flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.log)), exist_ok=True)
    with open(args.log, "a") as f:
        f.write(line + "\n")
    return 0 if ok else 3  # 3 = error RECORDED (terminal, don't retry)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--child-timeout", type=float, default=2700.0)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of config tags to run")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config (16^3 b1, with and without remat) "
                         "for CPU plumbing verification")
    ap.add_argument("--inproc", action="store_true",
                    help="child mode: measure exactly one --only tag")
    args = ap.parse_args()

    if args.inproc:
        if not args.only or len(args.only) != 1:
            ap.error("--inproc requires exactly one --only tag")
        return _run_inproc(args)

    # each config runs in its OWN child process: compile-helper crashes and
    # server-side HBM held by prior executables must not poison the rest
    import subprocess
    done = _logged_tags(args.log)
    for tag, *_ in _configs(args.smoke):
        if args.only and tag not in args.only:
            continue
        if tag in done:
            print(f"{tag}: already in {args.log}; skipping", flush=True)
            continue
        cmd = [sys.executable, os.path.abspath(__file__), "--log", args.log,
               "--reps", str(args.reps),
               "--probe-timeout", str(args.probe_timeout),
               "--only", tag, "--inproc"]
        if args.smoke:
            cmd.append("--smoke")
        try:
            rc = subprocess.run(cmd, timeout=args.child_timeout).returncode
        except subprocess.TimeoutExpired:
            print(f"{tag}: child exceeded {args.child_timeout:.0f} s; killed",
                  file=sys.stderr, flush=True)
            continue
        if rc == PROBE_FAILED_RC:
            return PROBE_FAILED_RC  # tunnel down — retry the stage later
    # success = at least one config measured across all runs (the
    # known-crashing configs are negative results, not stage failures)
    measured = 0
    if os.path.exists(args.log):
        for line in open(args.log):
            if line.strip().startswith("{") and "patches_per_s" in line:
                measured += 1
    return 0 if measured else 1


if __name__ == "__main__":
    sys.exit(main())
