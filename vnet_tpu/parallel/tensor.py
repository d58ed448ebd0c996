"""Minimal tensor parallelism: convolution output channels sharded over a
mesh axis.

SURVEY.md §2.5 marks TP "optional: not required for parity" — the
reference (single GPU, 16-128 channels) has nothing like it, and at
V-Net's channel counts data/spatial parallelism dominate: a 128-channel
5^3 conv shard would leave most of the MXU's 128 lanes idle per device,
so TP only pays once ``num_channels`` is a multiple of 128 *per shard*
(e.g. research configs with 512+ channels, where the kernel tensor
``5^3 x C x C`` also stops fitting comfortably per device).

This module provides that minimal version for such configs:

* ``tp_conv`` — SAME stride-1 conv with the kernel's OUTPUT channels
  sharded over ``axis``; activations stay replicated, one tiled
  ``all_gather`` re-assembles the channel dim (the classic Megatron
  column-parallel layout, here over XLA collectives on ICI).
* ``shard_kernel`` / ``replicate`` — helpers to place the weights.

Composable with the ``data`` axis: use a 2D mesh ``(data, model)`` and
keep batch sharding on ``data`` (XLA compiles the channel all-gather over
the ``model`` axis only).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def make_tp_mesh(model_parallel: int = 0, devices=None) -> Mesh:
    """1D ``(model,)`` mesh for standalone TP use/tests."""
    devices = list(devices if devices is not None else jax.devices())
    if model_parallel <= 0:
        model_parallel = len(devices)
    grid = np.asarray(devices[:model_parallel])
    return Mesh(grid, (MODEL_AXIS,))


def shard_kernel(mesh: Mesh, kernel, axis: str = MODEL_AXIS):
    """Place a ``(k..., Cin, Cout)`` kernel with Cout sharded over
    ``axis`` (column-parallel)."""
    rank = kernel.ndim - 2
    spec = P(*([None] * (rank + 1) + [axis]))
    return jax.device_put(kernel, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def _dim_numbers(rank: int):
    if rank == 2:
        return ("NHWC", "HWIO", "NHWC")
    if rank == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"rank {rank}")


def tp_conv(mesh: Mesh, x, kernel, axis: str = MODEL_AXIS,
            padding: str = "SAME"):
    """SAME stride-1 conv with output channels sharded over ``axis``
    (Megatron-style column parallelism).

    ``x``: replicated ``(B, *spatial, Cin)``; ``kernel``:
    ``(k..., Cin, Cout)`` with ``Cout % mesh.shape[axis] == 0``. Each
    device convolves its ``Cout/M`` kernel slice; the result is a GLOBAL
    array whose channel dim is sharded over ``axis`` — numerically equal
    to the unsharded conv, with no collective on the forward path (a
    chained row-parallel layer, or any cross-channel consumer, triggers
    XLA's all_gather lazily where actually needed).
    """
    rank = kernel.ndim - 2
    cout = kernel.shape[-1]
    m = mesh.shape[axis]
    if cout % m:
        raise ValueError(f"Cout={cout} not divisible by {axis}={m}")
    kspec = P(*([None] * (rank + 1) + [axis]))
    ospec = P(*([None] * (rank + 1) + [axis]))

    @partial(shard_map, mesh=mesh, in_specs=(P(), kspec), out_specs=ospec)
    def run(xs, ks):
        return jax.lax.conv_general_dilated(
            xs, ks, (1,) * rank, padding,
            dimension_numbers=_dim_numbers(rank))

    return run(x, kernel)
