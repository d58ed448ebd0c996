"""Segmentation losses as pure, fused JAX functions.

Behavioral parity targets (all verified against hand-computed values in
``tests/test_losses.py``):

* ``dice_coe`` — soft Sørensen/Jaccard dice with optional per-class weights
  and ``smooth=1e-5``, matching `/root/reference/model.py:26-85` including
  the weighted branch's ``sum(2*w*inse + s) / sum(w*(l+r) + s)`` form
  (`model.py:73-75`). NB this form weights the SUMMED numerators and
  denominators, not the per-class dice scores: with extreme class
  imbalance the background's large intersection still dominates unless
  its weight is ~(foreground fraction) small — e.g. weights [0.1, 1] on
  a 0.1%-foreground task leave the loss ~insensitive to the foreground
  (observed in an end-to-end run; weight background accordingly).
* ``weighted_softmax_cross_entropy`` — per-voxel class-weighted xent,
  `/root/reference/model.py:87-92`.
* ``segmentation_loss`` — the 10-way string dispatch of
  `/root/reference/model.py:495-560` (xent / weighted_xent / sorensen /
  jaccard / weighted_* / mixed_*), returning the scalar loss plus a dict of
  the component values the reference logs to TensorBoard.

TPU notes: everything reduces with ``jnp`` ops so XLA fuses the softmax,
one-hot and reductions into the backward pass of the conv stack; reductions
accumulate in float32 even under bfloat16 activations.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

LOSS_NAMES = (
    "xent", "weighted_xent",
    "sorensen", "weighted_sorensen",
    "jaccard", "weighted_jaccard",
    "mixed_sorensen", "mixed_weighted_sorensen",
    "mixed_jaccard", "mixed_weighted_jaccard",
)


def dice_coe(output, target, loss_type: str = "jaccard", axis=(1, 2, 3),
             weights: Sequence[float] = (), smooth: float = 1e-5,
             partition_axis: str = None):
    """Soft dice coefficient (1 = perfect overlap). See `model.py:26-85`.

    ``partition_axis``: name of a mesh axis the spatial dims are sharded
    over (inside ``shard_map``) — the per-(batch, class) sufficient
    statistics are ``psum``-ed over it so the dice equals the unsharded
    value exactly (`vnet_tpu/parallel/spatial.py` training path).
    """
    output = output.astype(jnp.float32)
    target = target.astype(jnp.float32)
    axis = tuple(axis)

    inse = jnp.sum(output * target, axis=axis)
    if loss_type == "jaccard":
        l = jnp.sum(output * output, axis=axis)
        r = jnp.sum(target * target, axis=axis)
    elif loss_type == "sorensen":
        l = jnp.sum(output, axis=axis)
        r = jnp.sum(target, axis=axis)
    else:
        raise ValueError(f"Unknown loss_type: {loss_type!r}")
    if partition_axis is not None:
        inse = jax.lax.psum(inse, partition_axis)
        l = jax.lax.psum(l, partition_axis)
        r = jax.lax.psum(r, partition_axis)

    if len(weights):
        w = jnp.asarray(weights, dtype=jnp.float32)
        # weighted combination over the class axis, then batch mean
        # (reference model.py:70-75; note its `w = 1/(sum(t*t)+s)` line is
        # computed but never used — we do not reproduce dead code).
        dice = jnp.sum(2.0 * w * inse + smooth, axis=-1) / jnp.sum(
            w * (l + r) + smooth, axis=-1)
        return jnp.mean(dice)
    dice = (2.0 * inse + smooth) / (l + r + smooth)
    return jnp.mean(dice)


def softmax_cross_entropy(labels_onehot, logits, partition_axis: str = None):
    """Mean softmax cross entropy, numerically stable via log_softmax.

    ``partition_axis``: equal-sized spatial shards mean the global voxel
    mean is the ``pmean`` of local means.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_voxel = -jnp.sum(labels_onehot.astype(jnp.float32) * logp, axis=-1)
    loss = jnp.mean(per_voxel)
    if partition_axis is not None:
        loss = jax.lax.pmean(loss, partition_axis)
    return loss


def weighted_softmax_cross_entropy(labels_onehot, logits, weights,
                                   partition_axis: str = None):
    """Class-weighted xent (`model.py:87-92`): weight of each voxel is the
    weight of its true class."""
    w = jnp.asarray(weights, dtype=jnp.float32)
    voxel_w = jnp.sum(w * labels_onehot.astype(jnp.float32), axis=-1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_voxel = -jnp.sum(labels_onehot.astype(jnp.float32) * logp, axis=-1)
    loss = jnp.mean(per_voxel * voxel_w)
    if partition_axis is not None:
        loss = jax.lax.pmean(loss, partition_axis)
    return loss


def segmentation_loss(logits, labels, *, name: str, num_classes: int,
                      weights: Sequence[float] = (), alpha: float = 1.0,
                      partition_axis: str = None):
    """Dispatch of the reference's loss zoo (`model.py:495-560`).

    Args:
      logits: ``(B, *spatial, C)`` raw network output.
      labels: ``(B, *spatial)`` int class ids.
      name: one of ``LOSS_NAMES``.
      num_classes: C.
      weights: per-class weights for the ``weighted_*`` variants.
      alpha: xent mixing factor for the ``mixed_*`` variants.
      partition_axis: mesh axis name the spatial dims are sharded over
        (``shard_map`` spatial-parallel training); reductions become
        collective so the loss matches the unsharded value exactly.

    Returns:
      ``(loss, aux)`` where aux holds the logged components
      (``dice``/``xent`` scalars where applicable, as in model.py:529-558).
    """
    if name not in LOSS_NAMES:
        raise ValueError(f"Invalid loss function: {name!r}")

    spatial_axes = tuple(range(1, labels.ndim))
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    softmax = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dice_axis = spatial_axes  # class axis stays: reduce spatial dims only
    aux = {}

    def _dice(loss_type, weighted):
        return dice_coe(softmax, onehot, loss_type=loss_type, axis=dice_axis,
                        weights=weights if weighted else (),
                        partition_axis=partition_axis)

    if name == "xent":
        loss = softmax_cross_entropy(onehot, logits, partition_axis)
    elif name == "weighted_xent":
        loss = weighted_softmax_cross_entropy(onehot, logits, weights,
                                              partition_axis)
    elif name in ("sorensen", "weighted_sorensen"):
        loss = 1.0 - _dice("sorensen", name.startswith("weighted"))
    elif name in ("jaccard", "weighted_jaccard"):
        loss = 1.0 - _dice("jaccard", name.startswith("weighted"))
    else:  # mixed_*
        weighted = "weighted" in name
        loss_type = "sorensen" if "sorensen" in name else "jaccard"
        if weighted:
            xent = weighted_softmax_cross_entropy(onehot, logits, weights,
                                                  partition_axis)
        else:
            xent = softmax_cross_entropy(onehot, logits, partition_axis)
        dice_loss = 1.0 - _dice(loss_type, weighted)
        aux["dice"] = dice_loss
        aux["regularized_xent"] = alpha * xent
        loss = dice_loss + alpha * xent

    aux["total_loss"] = loss
    return loss, aux
