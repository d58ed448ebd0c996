"""Host->device staging helpers for size-limited transports.

This environment's remote TPU tunnel rejects single requests larger than
~128 MB (HTTP 413 — observed at one 134 MB float32 image tensor), so
large host arrays are staged in bounded ``device_put`` chunks and
concatenated on-device. Pure setup-path: never used inside a timed or
jitted region. The reference has no counterpart (its feed_dict transfers
were per-step and small — `/root/reference/model.py:735-748`).
"""

from __future__ import annotations


def device_put_chunked(arr, max_bytes: int = 64 << 20):
    """``jax.device_put(arr)``, split along axis 0 into <=``max_bytes``
    transfers when the array exceeds the budget. Value-identical to the
    single-transfer path (tests/test_ab_train.py)."""
    import jax
    import jax.numpy as jnp

    row = arr[0:1].nbytes
    per = max(1, int(max_bytes // row))
    if per >= arr.shape[0]:
        return jax.device_put(arr)
    return jnp.concatenate([jax.device_put(arr[i:i + per])
                            for i in range(0, arr.shape[0], per)], axis=0)
