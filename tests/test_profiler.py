"""Profiling subsystem units (vnet_tpu/profiler.py — SURVEY §5.1 gap)."""

import os
import time

import jax
import jax.numpy as jnp

from vnet_tpu.profiler import StepTimer, TraceCapture


def test_step_timer_warmup_and_stats():
    t = StepTimer(warmup=2)
    for i in range(5):
        with t:
            time.sleep(0.01)
    assert len(t.times) == 3  # first two are warmup
    assert 0.005 < t.mean < 0.1
    assert t.p50 > 0
    assert t.throughput(items_per_step=4) > 0


def test_trace_capture_writes_profile(tmp_path):
    out = str(tmp_path / "trace")
    with TraceCapture(out):
        x = jnp.ones((64, 64))
        y = jax.jit(lambda a: a @ a)(x)
        y.block_until_ready()
    found = []
    for root, _dirs, files in os.walk(out):
        found.extend(files)
    assert any("xplane" in f or "trace" in f for f in found)


def test_analyze_trace_summarizes_device_ops(tmp_path, capsys):
    import gzip
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import analyze_trace

    # synthetic Chrome trace: an 'XLA Ops' thread with a while container
    # wrapping a fusion + copy, plus a host thread that must be ignored
    events = [
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "while", "ts": 0,
         "dur": 1000},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.3", "ts": 0,
         "dur": 700},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "ts": 700,
         "dur": 300},
        {"ph": "X", "pid": 7, "tid": 1, "name": "hostwork", "ts": 0,
         "dur": 9999},
    ]
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(d / "m.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    assert analyze_trace.main([str(tmp_path), "--group"]) == 0
    out = capsys.readouterr().out
    # busy time excludes the while container and the host event: 1.0 ms
    assert "device busy time: 1.00 ms" in out
    assert "fusion" in out and "copy" in out and "hostwork" not in out


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
