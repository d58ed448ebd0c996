"""bench.py robustness: a hung backend init must not eat the driver's
timeout window (VERDICT r2 item 2 — BENCH_r02 died rc=124 against exactly
this). The parent supervises child attempts; a child whose init probe
hangs exits fast and a fresh process retries."""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _env(tmp_path, **extra):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        # tiny workload so the CPU run finishes quickly
        "VNET_BENCH_PATCH": "16",
        "VNET_BENCH_BATCH": "2",
        "VNET_BENCH_SCAN": "1",
        "VNET_BENCH_REPS": "1",
        "VNET_BENCH_CHANNELS": "4",
        "VNET_BENCH_PROBE_TIMEOUT": "3",
        "VNET_BENCH_RETRY_SLEEP": "0",
        "VNET_BENCH_FAKE_HANG_ONCE": str(tmp_path / "hang_marker"),
    })
    env.update({k: str(v) for k, v in extra.items()})
    return env


def test_hung_init_fails_fast(tmp_path):
    """With one simulated init hang and one parent attempt, bench must
    exit nonzero within seconds — not hang for the backend's ~25 min."""
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, BENCH], cwd=REPO, timeout=120,
        env=_env(tmp_path, VNET_BENCH_PARENT_ATTEMPTS=1),
        capture_output=True, text=True)
    elapsed = time.monotonic() - t0
    assert proc.returncode == 1, (proc.stdout, proc.stderr[-1000:])
    assert "hung" in proc.stderr
    assert elapsed < 60, f"fail-fast took {elapsed:.0f}s"


def test_recovers_after_hang_and_emits_json(tmp_path):
    """First child hangs (simulated outage), second child runs the real
    benchmark on CPU and prints the driver's JSON line."""
    proc = subprocess.run(
        [sys.executable, BENCH], cwd=REPO, timeout=900,
        env=_env(tmp_path, VNET_BENCH_PARENT_ATTEMPTS=2),
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rc=42" in proc.stderr  # first attempt was the simulated hang
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "train_patches_per_sec_per_chip_64cube_vnet"
    assert rec["value"] > 0
    assert rec["unit"] == "patches/s/chip"
    # both fields are rounded to 3 decimals before printing
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 25.0, abs=1e-3)
