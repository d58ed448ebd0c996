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
