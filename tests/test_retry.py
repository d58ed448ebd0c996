"""Fault-injection tests for the transient-failure retry path
(vnet_tpu/utils/retry.py) and the loader's worker-liveness check."""

import numpy as np
import pytest

from vnet_tpu.utils.retry import is_transient_error, retry_transient


class XlaRuntimeError(RuntimeError):
    """Stand-in with the runtime error type name the classifier matches."""


def test_transient_classification():
    assert is_transient_error(
        XlaRuntimeError("FAILED_PRECONDITION: device buffer not ready"))
    assert is_transient_error(XlaRuntimeError("UNAVAILABLE: socket closed"))
    assert not is_transient_error(
        XlaRuntimeError("INVALID_ARGUMENT: shape mismatch"))
    assert not is_transient_error(ValueError("FAILED_PRECONDITION text"))


def test_retry_recovers_from_transient():
    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 3:
            raise XlaRuntimeError("UNAVAILABLE: injected")
        return x * 2

    assert retry_transient(flaky, 21, max_attempts=3, base_delay=0.0) == 42
    assert len(calls) == 3


def test_retry_exhaustion_raises():
    def always(x):
        raise XlaRuntimeError("ABORTED: injected")

    with pytest.raises(XlaRuntimeError):
        retry_transient(always, 1, max_attempts=2, base_delay=0.0)


def test_deterministic_error_not_retried():
    calls = []

    def bad(x):
        calls.append(x)
        raise XlaRuntimeError("INVALID_ARGUMENT: injected")

    with pytest.raises(XlaRuntimeError):
        retry_transient(bad, 1, max_attempts=5, base_delay=0.0)
    assert len(calls) == 1  # no retries on deterministic failures


class _CrashDataset:
    """get_sample kills the worker process outright (simulates OOM-kill /
    segfaulting parser) — no exception ever reaches the result queue."""

    def __len__(self):
        return 4

    def get_sample(self, i):
        import os
        os._exit(17)


@pytest.mark.timeout(120)
def test_process_loader_detects_dead_worker():
    from vnet_tpu.data.loader import BatchLoader
    loader = BatchLoader(_CrashDataset(), batch_size=2, shuffle=False,
                         num_workers=1, backend="process")
    with pytest.raises(RuntimeError, match="died"):
        for _ in loader.epoch():
            pass


class _CleanExitDataset:
    """get_sample exits the worker with code 0 (e.g. a parser calling
    sys.exit()) — still a missing result, must not hang the epoch."""

    def __len__(self):
        return 4

    def get_sample(self, i):
        import os
        os._exit(0)


@pytest.mark.timeout(120)
def test_process_loader_detects_clean_exit_without_results():
    from vnet_tpu.data.loader import BatchLoader
    loader = BatchLoader(_CleanExitDataset(), batch_size=2, shuffle=False,
                         num_workers=1, backend="process")
    with pytest.raises(RuntimeError, match="without posting"):
        for _ in loader.epoch():
            pass


class _OkDataset:
    def __len__(self):
        return 6

    def get_sample(self, i):
        return (np.full((2, 2), i, np.float32), np.int32(i))


def test_process_loader_clean_completion_joins_workers():
    from vnet_tpu.data.loader import BatchLoader
    loader = BatchLoader(_OkDataset(), batch_size=2, shuffle=False,
                         num_workers=2, backend="process")
    batches = list(loader.epoch())
    assert len(batches) == 3
    imgs = np.concatenate([b[0] for b in batches])
    assert imgs[:, 0, 0].tolist() == [0, 1, 2, 3, 4, 5]


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
