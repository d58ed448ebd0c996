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
    """Shard the leading (batch) dim over the data axis; when the mesh has
    a non-trivial ``space`` axis, additionally shard the first spatial dim
    over it (GSPMD spatial partitioning: XLA propagates the sharding
    through the convs and inserts the halo collectives — the compiler-
    managed counterpart of `vnet_tpu/parallel/spatial.py`'s explicit
    shard_map halos)."""
    if SPACE_AXIS in mesh.shape and mesh.shape[SPACE_AXIS] > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with batch-dim sharding."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_multislice_mesh(ici_data_parallel: int = 0,
                         dcn_data_parallel: int = 0,
                         space_parallel: int = 1,
                         devices: Optional[Sequence] = None) -> Mesh:
    """Mesh for multi-slice deployments: the ``data`` axis spans
    DCN-major × ICI-minor so gradient all-reduce hierarchically reduces
    inside each slice over ICI first, then once across slices over DCN
    (XLA decomposes the psum along mesh axis order). The ``space`` axis
    (halo exchange, ppermute-heavy) always stays inside a slice.

    Falls back to plain device order when the runtime exposes no slice
    topology (CPU meshes, single slice) — same axis names, so calling
    code is identical either way.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn_data_parallel <= 0:
        slice_ids = {getattr(d, "slice_index", 0) for d in devices}
        dcn_data_parallel = max(len(slice_ids), 1)
    if ici_data_parallel <= 0:
        ici_data_parallel = n // (dcn_data_parallel * space_parallel)
    want = ici_data_parallel * dcn_data_parallel * space_parallel
    if want != n:
        raise ValueError(
            f"mesh dcn={dcn_data_parallel} x ici={ici_data_parallel} x "
            f"space={space_parallel} needs {want} devices, have {n}")

    # Only use the hybrid (DCN-aware) mesh builder when the runtime exposes
    # a real multi-slice topology; on CPU meshes / single slices fall back
    # to plain device order (jax.devices() is slice-major). A failure WITH
    # topology present is a real configuration bug and must propagate —
    # silently falling back would straddle the ICI-minor axis across DCN
    # and quietly wreck all-reduce throughput.
    slice_indices = {getattr(d, "slice_index", None) for d in devices}
    has_topology = len(slice_indices - {None}) > 1
    if has_topology:
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data_parallel, space_parallel),
            dcn_mesh_shape=(dcn_data_parallel, 1),
            devices=devices)
    else:
        grid = np.asarray(devices).reshape(
            dcn_data_parallel * ici_data_parallel, space_parallel)
    grid = np.asarray(grid).reshape(
        dcn_data_parallel * ici_data_parallel, space_parallel)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def shard_batch_per_host(mesh: Mesh, *arrays):
    """Assemble a GLOBAL batch from each process's local shard.

    In multi-process (multi-host / multi-slice) runs every host loads only
    its own cases; ``jax.make_array_from_process_local_data`` stitches the
    per-host arrays into one global batch-sharded array without gathering
    through host 0. Single-process: identical to :func:`shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, *arrays)
    s = batch_sharding(mesh)
    out = tuple(jax.make_array_from_process_local_data(s, np.asarray(a))
                for a in arrays)
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
