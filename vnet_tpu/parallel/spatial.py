"""Whole-network spatial partitioning — run the full V-Net forward on a
volume sharded across the mesh.

The reference's answer to "input bigger than memory" is host-side tiling
(SURVEY.md §5.7: patch training model.py:866-937, offline z-chunking
image_partition.py:13-48). Sliding-window tiling is still the production
inference path here, but some workloads need the network's *receptive
field* to span the whole volume (no seams at all) or a single patch that
exceeds one chip's HBM. For those, this module shards one spatial axis of
the volume over a mesh axis and runs the ENTIRE network under
``shard_map``, exchanging conv halos between ring neighbors at every
stencil op — the volumetric analog of ring attention's neighbor exchange.

Mechanics:

* a context (``spatial_partition_scope``) marks the sharded axis; inside
  it every ``SpatialConv`` (`vnet_tpu/models/layers.py`) performs a
  ``ppermute`` halo exchange of ``k//2`` slabs on that axis and convolves
  VALID there (SAME elsewhere) — bitwise-matching the unsharded SAME conv.
  The space-to-depth packed convs exchange halos directly in the packed
  domain (1 packed voxel for a 5^3 kernel instead of 2 unpacked).
* stride-2 down-convs, 2^r transpose up-convs and 1^r pointwise convs are
  purely local on even-sized shards — no exchange.
* norms: eval-mode BatchNorm is pointwise (running stats). The reference's
  ``batch_stats`` quirk-mode (batch statistics at inference, model.py:917)
  reduces over the sharded spatial axis with ``pmean`` so statistics equal
  the unsharded ones exactly.

Requirements: the local shard size along the sharded axis must stay even
through every level, i.e. ``dim % (shards * 2**num_levels) == 0``; train
mode (EMA updates, dropout) is out of scope — this is an inference path.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (mesh_axis_name, spatial_axis_index) — spatial index counts spatial dims
# only (0 = first spatial dim), matching volume layout (*spatial, C).
_CTX: contextvars.ContextVar[Optional[Tuple[str, int]]] = \
    contextvars.ContextVar("spatial_partition", default=None)


def current_partition() -> Optional[Tuple[str, int]]:
    """The active (axis_name, spatial_axis) partition, or None."""
    return _CTX.get()


@contextlib.contextmanager
def spatial_partition_scope(axis_name: str, spatial_axis: int):
    """Mark the code inside as running on a spatially-sharded local block
    (must itself execute inside ``shard_map``)."""
    token = _CTX.set((axis_name, int(spatial_axis)))
    try:
        yield
    finally:
        _CTX.reset(token)


def halo_exchange_asym(x: jnp.ndarray, lo: int, hi: int, axis_name: str,
                       axis: int) -> jnp.ndarray:
    """Asymmetric halo exchange: pad ``lo`` slabs from the left neighbor
    and ``hi`` slabs from the right along ``axis``; ring boundaries get
    zeros (SAME-conv semantics). Must run inside ``shard_map``."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    size = x.shape[axis]

    parts = []
    if lo:
        # left neighbor's top `lo` slabs become our low halo
        hi_slab = jax.lax.slice_in_dim(x, size - lo, size, axis=axis)
        from_left = jax.lax.ppermute(
            hi_slab, axis_name, [(i, (i + 1) % n) for i in range(n)])
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        parts.append(from_left)
    parts.append(x)
    if hi:
        lo_slab = jax.lax.slice_in_dim(x, 0, hi, axis=axis)
        from_right = jax.lax.ppermute(
            lo_slab, axis_name, [(i, (i - 1) % n) for i in range(n)])
        from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                               from_right)
        parts.append(from_right)
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=axis)


def validate_partition(volume_shape, spatial_axis: int, shards: int,
                       num_levels: int, kernel_halo: int = 2) -> None:
    """Host-side check that the sharded axis stays even through the
    encoder so every down-conv and s2d pack stays purely local, and that
    the deepest level's local shard still covers one conv halo
    (``kernel_halo = k//2``, 2 for the V-Net's 5^r kernels)."""
    dim = volume_shape[spatial_axis]
    quantum = shards * (2 ** num_levels)
    if dim % quantum:
        raise ValueError(
            f"spatial axis {spatial_axis} (size {dim}) must be a multiple "
            f"of shards * 2**num_levels = {quantum} for halo-sharded "
            f"execution; pad the volume first")
    if dim // quantum < kernel_halo:
        raise ValueError(
            f"spatial axis {spatial_axis}: bottom-level local shard "
            f"{dim // quantum} is smaller than the conv halo "
            f"{kernel_halo}; use fewer shards or a larger volume")


def spatial_sharded_forward(network, variables, volume, mesh: Mesh,
                            axis_name: str = "space", spatial_axis: int = 0,
                            num_levels: Optional[int] = None):
    """Run ``network.apply(variables, volume[None], train=False)`` with the
    volume sharded along one spatial axis over ``mesh[axis_name]``.

    Args:
      network: a flax module from the model zoo (VNet/UNet/...).
      variables: ``{"params": ..., "batch_stats": ...}`` (replicated).
      volume: ``(*spatial, C)`` array — ONE case, no batch dim.
      mesh: mesh containing ``axis_name``.
      spatial_axis: which spatial dim to shard (0-based).
      num_levels: encoder depth for the divisibility check (defaults to
        ``network.num_levels`` when present).

    Returns logits ``(*spatial, num_classes)`` sharded the same way.
    Matches the unsharded forward exactly (see tests/test_spatial_sharded.py).
    """
    rank = volume.ndim - 1
    if not 0 <= spatial_axis < rank:
        raise ValueError(f"spatial_axis {spatial_axis} out of range "
                         f"for rank-{rank} volume")
    shards = mesh.shape[axis_name]
    levels = num_levels if num_levels is not None else getattr(
        network, "num_levels", 0)
    validate_partition(volume.shape, spatial_axis, shards, levels)

    parts = [None] * (rank + 1)
    parts[spatial_axis] = axis_name
    spec = P(*parts)

    def local(vars_, vol):
        with spatial_partition_scope(axis_name, spatial_axis):
            # mutable allows the "batch_stats" quirk norm (batch statistics
            # at inference, model.py:917) to run; EMA updates are discarded
            out, _ = network.apply(vars_, vol[None], train=False,
                                   mutable=["batch_stats"])
        return out[0]

    fn = shard_map(local, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
                   check_vma=False)
    sharded_vol = jax.device_put(volume, NamedSharding(mesh, spec))
    return jax.jit(fn)(variables, sharded_vol)
