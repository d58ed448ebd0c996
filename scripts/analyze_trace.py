"""Summarize a JAX profiler trace: device-time breakdown by op.

Usage:
    python scripts/analyze_trace.py TRACE_DIR [--top N] [--group]

TRACE_DIR is a directory previously passed to ``jax.profiler.start_trace``
(or ``--profile_dir``); the newest ``*.trace.json.gz`` under it is parsed.
Prints total device busy time and the top ops by accumulated duration,
with a coarse category (convolution / fusion / copy / reduce / other) so
layout-copy and transpose regressions stand out at a glance.

The reference had no profiling story at all (SURVEY.md §5.1); this is part
of the TPU rebuild's observability tooling alongside vnet_tpu/profiler.py.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import pathlib
import re
import sys


def find_trace(trace_dir: str) -> pathlib.Path:
    paths = sorted(pathlib.Path(trace_dir).rglob("*.trace.json.gz"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    return paths[-1]


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n and "convert" not in n:
        return "conv"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    if "dynamic" in n or "slice" in n or "concat" in n or "pad" in n:
        return "data-movement"
    if "rng" in n or "threefry" in n or "philox" in n:
        return "rng"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def op_tracks(events: list[dict]) -> set[tuple[int, int]]:
    """(pid, tid) pairs for op-granularity device tracks.

    TPU traces nest Steps > XLA Modules > while/call > XLA Ops; summing
    every span double-counts parents, so keep only the 'XLA Ops' threads
    (the leaf op level the Trace Viewer shows).
    """
    tracks = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tname = ev.get("args", {}).get("name", "")
            if tname == "XLA Ops":
                tracks.add((ev["pid"], ev["tid"]))
    return tracks


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--group", action="store_true",
                    help="merge ops that differ only by trailing .N suffix")
    args = ap.parse_args(argv)

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tracks = op_tracks(events)

    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if tracks and (ev.get("pid"), ev.get("tid")) not in tracks:
            continue
        name = ev.get("name", "?")
        # control-flow containers nest their body ops on the same thread;
        # counting them would double every op inside a lax.scan/cond
        if re.fullmatch(r"(while|conditional|call)(\.\d+)?", name):
            continue
        if args.group:
            name = re.sub(r"\.\d+$", "", name)
        totals[name] += ev["dur"]
        counts[name] += 1

    if not totals:
        raise SystemExit(f"no device events in {path} "
                         "(pass a dir captured with jax.profiler.start_trace)")

    busy_us = sum(totals.values())
    by_cat: dict[str, float] = collections.defaultdict(float)
    for name, us in totals.items():
        by_cat[categorize(name)] += us

    print(f"trace: {path}")
    print(f"device busy time: {busy_us / 1e3:.2f} ms "
          f"across {sum(counts.values())} events\n")
    print("by category:")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<16} {us / 1e3:>10.2f} ms  {100 * us / busy_us:5.1f}%")
    print(f"\ntop {args.top} ops:")
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in ranked:
        print(f"  {us / 1e3:>10.2f} ms  x{counts[name]:<5} "
              f"[{categorize(name)}] {name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
