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
through every level, i.e. ``dim % (shards * 2**num_levels) == 0``.

``spatial_sharded_forward`` is the inference path (one whole volume);
``spatial_sharded_train_step`` is the training path (batch of patches
larger than one chip's HBM): train-mode BatchNorm moments ``pmean`` over
the partition, the loss statistics ``psum``, and ``jax.grad`` taken
through the ``shard_map`` — matching the unsharded step exactly
(dropout uses per-shard streams).
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


def spatial_sharded_train_step(network, tx, mesh: Mesh, *, loss_name: str,
                               num_classes: int, weights=(),
                               alpha: float = 1.0,
                               axis_name: str = "space",
                               spatial_axis: int = 0,
                               num_levels: Optional[int] = None):
    """Build a jitted TRAIN step with activations sharded along one
    spatial axis — train on patches larger than one chip's HBM (the
    training-side analog of sequence parallelism, SURVEY §5.7).

    Semantics vs the unsharded step (verified in
    tests/test_spatial_sharded.py):

    * convs: halo exchange per stencil op — identical activations.
    * train-mode BatchNorm: batch moments are ``pmean``-ed over the
      partition (`models/layers.py`), equal to the unsharded moments with
      equal shard sizes; EMA updates therefore also match.
    * loss: the dice/xent sufficient statistics are ``psum``-ed
      (``segmentation_loss(partition_axis=...)``) — global loss, exact.
    * gradients: ``jax.grad`` differentiates THROUGH the ``shard_map``
      (grad outside, the canonical pattern): with ``check_vma=True`` the
      VMA machinery transposes the loss ``psum`` to a broadcast and the
      replicated-parameter boundary to a ``psum``, yielding the exact
      global gradient. (Taking grad INSIDE the shard_map mis-transposes
      the collectives and over-counts — measured 4x at 4 shards.)
    * dropout: per-shard fold_in streams — same keep rate, different
      noise sites than the unsharded step (dropout is the one stochastic
      deviation; rate 0 is bitwise-equivalent modulo float reduction
      order).

    Args:
      network: flax module; ``tx``: optax transform.
      loss_name/num_classes/weights/alpha: as ``segmentation_loss``.
      spatial_axis: which spatial dim of ``(B, *spatial[, C])`` inputs is
        sharded.

    Returns ``step(carry, images, labels, rng) -> (carry, loss)`` where
    ``carry = (params, batch_stats, opt_state)`` is replicated, ``images``
    ``(B, *spatial, C)`` and ``labels`` ``(B, *spatial)`` are sharded on
    ``1 + spatial_axis``. The function handles device_put of the inputs;
    the carry stays replicated across calls.
    """
    import optax  # deferred: optax is train-path-only
    from ..ops.losses import segmentation_loss

    shards = mesh.shape[axis_name]

    def _spec_for(ndim, offset=1):
        parts = [None] * ndim
        parts[offset + spatial_axis] = axis_name
        return P(*parts)

    def local_loss(params, batch_stats, images, labels, rng):
        with spatial_partition_scope(axis_name, spatial_axis):
            drop_rng = jax.random.fold_in(
                rng, jax.lax.axis_index(axis_name))
            out, mut = network.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"])
            loss, _ = segmentation_loss(
                out, labels, name=loss_name, num_classes=num_classes,
                weights=weights, alpha=alpha, partition_axis=axis_name)
        # norms without a batch_stats collection (group/instance/none)
        # mutate nothing — return the empty dict rather than KeyError
        return loss, mut.get("batch_stats", {})

    # one compiled executable per input rank — building the shard_map/jit
    # inside step() would retrace and recompile EVERY call (jit caches by
    # function identity)
    _jitted = {}

    def _get_jitted(img_ndim, lbl_ndim):
        key = (img_ndim, lbl_ndim)
        if key not in _jitted:
            sharded_loss = shard_map(
                local_loss, mesh=mesh,
                in_specs=(P(), P(), _spec_for(img_ndim), _spec_for(lbl_ndim),
                          P()),
                out_specs=(P(), P()), check_vma=True)

            def train_step(params, batch_stats, opt_state, im, lb, r):
                (loss, new_bs), grads = jax.value_and_grad(
                    sharded_loss, has_aux=True)(params, batch_stats, im, lb,
                                                r)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                return (new_params, new_bs, new_opt), loss

            _jitted[key] = jax.jit(train_step)
        return _jitted[key]

    def step(carry, images, labels, rng):
        rank = images.ndim - 2
        if not 0 <= spatial_axis < rank:
            raise ValueError(f"spatial_axis {spatial_axis} out of range "
                             f"for rank-{rank} inputs")
        levels = num_levels if num_levels is not None else getattr(
            network, "num_levels", 0)
        validate_partition(images.shape[1:], spatial_axis, shards, levels)
        fn = _get_jitted(images.ndim, labels.ndim)
        images = jax.device_put(
            images, NamedSharding(mesh, _spec_for(images.ndim)))
        labels = jax.device_put(
            labels, NamedSharding(mesh, _spec_for(labels.ndim)))
        params, batch_stats, opt_state = carry
        return fn(params, batch_stats, opt_state, images, labels, rng)

    return step
