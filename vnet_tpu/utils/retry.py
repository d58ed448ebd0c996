"""Retry wrapper for transient device-runtime failures.

This environment's TPU tunnel occasionally fails large host->device
transfers with FAILED_PRECONDITION (documented in CLAUDE.md); real fleets
see UNAVAILABLE/ABORTED during preemptions. The reference had no failure
handling at all — any error killed the process (SURVEY.md §5.3). The C++
executor retries transient PJRT codes (csrc/pjrt_executor.cc); this is
the Python-side counterpart, used by Trainer/Evaluator around H2D
transfers (which are safe to retry: the host arrays are still alive —
jitted calls with donated buffers are deliberately NOT wrapped, since a
failed donation invalidates its inputs).
"""

from __future__ import annotations

import sys
import time
from typing import Callable, TypeVar

T = TypeVar("T")

# absl status keywords that mark a plausibly-transient runtime failure
_TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "RESOURCE_EXHAUSTED",
    "Socket closed",
    "Connection reset",
)


def is_transient_error(exc: BaseException) -> bool:
    """True for runtime errors that can legitimately succeed on retry."""
    names = {type(exc).__name__} | {
        t.__name__ for t in type(exc).__mro__}
    if not ({"XlaRuntimeError", "JaxRuntimeError"} & names):
        return False
    msg = str(exc)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def retry_transient(fn: Callable[..., T], *args, max_attempts: int = 3,
                    base_delay: float = 0.5, on_retry=None, **kwargs) -> T:
    """Call ``fn(*args, **kwargs)``, retrying transient runtime errors with
    exponential backoff. Deterministic errors propagate immediately."""
    for attempt in range(1, max_attempts + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered below
            if attempt >= max_attempts or not is_transient_error(e):
                raise
            delay = base_delay * (2 ** (attempt - 1))
            if on_retry is not None:
                on_retry(attempt, e)
            else:
                # stderr: callers' stdout may be machine-readable (the
                # repo's one-JSON-line convention)
                print(f"retry_transient: attempt {attempt}/{max_attempts} "
                      f"failed ({type(e).__name__}: {str(e)[:160]}); "
                      f"retrying in {delay:.1f}s", file=sys.stderr)
            time.sleep(delay)
    raise AssertionError("unreachable")
