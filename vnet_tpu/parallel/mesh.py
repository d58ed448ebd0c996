"""Device-mesh construction for SPMD training/inference.

The reference is single-GPU (`/root/reference/main.py:62`,
SURVEY.md §2.5 — no multi-device parallelism of any kind); here every
entry point runs over a ``jax.sharding.Mesh``:

* ``data`` axis — batch/data parallelism (gradient psum compiled by XLA
  over ICI).
* optional ``space`` axis — spatial partitioning of volumes with halo
  exchange (see ``vnet_tpu.parallel.halo``).

On multi-slice deployments, order the axes so ``data`` maps to DCN and
``space``/model axes stay inside a slice (ICI) — mesh axis order follows
device order from ``jax.devices()``, which enumerates slice-major.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(data_parallel: int = 0, space_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, space)`` mesh.

    Args:
      data_parallel: size of the data axis; 0 = use every remaining device.
      space_parallel: size of the spatial-partitioning axis (1 = off).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if space_parallel < 1 or n % space_parallel:
        raise ValueError(f"space_parallel={space_parallel} must divide {n}")
    if data_parallel <= 0:
        data_parallel = n // space_parallel
    use = data_parallel * space_parallel
    if use > n:
        raise ValueError(
            f"mesh {data_parallel}x{space_parallel} needs {use} devices, "
            f"have {n}")
    grid = np.asarray(devices[:use]).reshape(data_parallel, space_parallel)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with batch-dim sharding."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def pad_batch_to_multiple(batch: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading dim up to a multiple (repeating the last sample) so a
    fixed batch shards evenly; returns (padded, original_count)."""
    b = batch.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch, b
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), b
