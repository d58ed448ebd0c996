"""Spatial partitioning with halo exchange — the volumetric analog of
sequence/context parallelism.

The reference handles inputs bigger than memory spatially: patch training,
tiled inference, offline z-chunking (SURVEY.md §5.7). The TPU-native
mechanism for a volume too big even for one chip is to shard a spatial axis
across the mesh and exchange boundary slabs ("halos") between neighbor
devices before each stencil op — exactly ring attention's neighbor
exchange, but for 5^3 convolution stencils (halo = kernel//2 voxels).

Implemented with ``shard_map`` + ``jax.lax.ppermute`` so XLA compiles the
exchanges onto ICI send/recv; no custom transport.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str,
                  axis: int) -> jnp.ndarray:
    """Pad local block with ``halo`` slabs from ring neighbors along
    ``axis``. Boundary shards get zero pads (SAME-conv semantics).

    Must be called inside ``shard_map``. Returns shape grown by
    ``2*halo`` along ``axis``.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    size = x.shape[axis]
    lo_slab = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    hi_slab = jax.lax.slice_in_dim(x, size - halo, size, axis=axis)

    # send our high slab to the right neighbor (it becomes their low halo),
    # and our low slab to the left neighbor (their high halo).
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(hi_slab, axis_name, right)
    from_right = jax.lax.ppermute(lo_slab, axis_name, left)

    zeros = jnp.zeros_like(lo_slab)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def sharded_conv(mesh: Mesh, axis_name: str, spatial_axis: int):
    """Build a spatially-sharded SAME convolution.

    Returns ``conv(volume, kernel) -> out`` where ``volume`` is
    ``(*spatial, Cin)`` sharded along ``spatial_axis`` over ``axis_name``
    and ``kernel`` is ``(*kspatial, Cin, Cout)`` replicated. Each device
    convolves its shard after a halo exchange of ``k//2`` slabs — output
    matches the unsharded SAME conv exactly (validated in tests).
    """

    def local_conv(vol, kernel):
        halo = kernel.shape[spatial_axis] // 2
        vol = halo_exchange(vol, halo, axis_name, spatial_axis)
        rank = kernel.ndim - 2
        # pad SAME on the non-sharded axes, VALID on the sharded one (the
        # halo already provides its context)
        pads = []
        for i in range(rank):
            k = kernel.shape[i]
            pads.append((0, 0) if i == spatial_axis else (k // 2, (k - 1) // 2))
        x = vol[None]  # add batch
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,) * rank, padding=pads,
            dimension_numbers=_dim_numbers(rank))
        return out[0]

    spec_in = [None] * 10
    rank_spec = None  # resolved per call

    def call(volume, kernel):
        rank = kernel.ndim - 2
        parts = [None] * (rank + 1)
        parts[spatial_axis] = axis_name
        vol_spec = P(*parts)
        fn = shard_map(local_conv, mesh=mesh,
                       in_specs=(vol_spec, P()), out_specs=vol_spec)
        return fn(volume, kernel)

    return call


def _dim_numbers(rank: int):
    if rank == 2:
        return ("NHWC", "HWIO", "NHWC")
    if rank == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"rank {rank} unsupported")


def shard_volume(mesh: Mesh, axis_name: str, spatial_axis: int,
                 volume: np.ndarray):
    """device_put a volume sharded along one spatial axis."""
    parts = [None] * volume.ndim
    parts[spatial_axis] = axis_name
    return jax.device_put(volume, NamedSharding(mesh, P(*parts)))
