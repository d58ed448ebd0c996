"""Device-side fused augmentation tail.

The reference runs every augmentation on the host per sample inside
``tf.py_func`` (`/root/reference/pipeline/NiftiDataset3D.py:48-50`). On
TPU, the geometry-stable tail — intensity windowing, random flips, additive
Gaussian noise, random fixed-size crops — runs as one jitted function over
the whole HBM-resident batch, so the host only does file reads and
geometry-changing resampling. All shapes static; randomness from explicit
PRNG keys; everything fuses into a couple of elementwise kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def window_normalize(images, window_min: float, window_max: float,
                     out_min: float = 0.0, out_max: float = 255.0):
    """Fused intensity windowing (ManualNormalization semantics)."""
    scale = (out_max - out_min) / max(window_max - window_min, 1e-12)
    out = (images - window_min) * scale + out_min
    return jnp.clip(out, out_min, out_max)


def random_flip(key, images, labels, axes: Sequence[int]):
    """Batch random flip: each sample flips all ``axes`` together with
    p=0.5 (RandomFlip semantics, `NiftiDataset3D.py:197-208`).

    images: (B, *spatial, C); labels: (B, *spatial).
    """
    b = images.shape[0]
    coin = jax.random.bernoulli(key, 0.5, (b,))

    flipped_i = images
    flipped_l = labels
    for ax in axes:
        flipped_i = jnp.flip(flipped_i, axis=ax + 1)
        flipped_l = jnp.flip(flipped_l, axis=ax + 1)
    sel = coin.reshape((b,) + (1,) * (images.ndim - 1))
    images = jnp.where(sel, flipped_i, images)
    labels = jnp.where(coin.reshape((b,) + (1,) * (labels.ndim - 1)),
                       flipped_l, labels)
    return images, labels


def random_noise(key, images, sigma: float = 5.0):
    """Additive Gaussian noise (RandomNoise, `NiftiDataset3D.py:553-572`)."""
    return images + sigma * jax.random.normal(key, images.shape, images.dtype)


def random_crop_from_candidates(key, volume, label, candidates,
                                patch_shape: Tuple[int, ...]):
    """Crop a random patch whose start corner is drawn from a precomputed
    candidate set.

    The reference's RandomCrop rejection loop (`NiftiDataset3D.py:513-542`)
    is data-dependent and cannot jit; the TPU-native formulation precomputes
    label-aware candidate corners on the host (cheap integral-image scan)
    and turns the device-side step into a uniform gather.

    Args:
      volume: (*spatial, C); label: (*spatial);
      candidates: (K, rank) int32 corner set (host-precomputed).
    """
    k = jax.random.randint(key, (), 0, candidates.shape[0])
    start = candidates[k]
    img = jax.lax.dynamic_slice(
        volume, tuple(start) + (0,), tuple(patch_shape) + (volume.shape[-1],))
    lbl = jax.lax.dynamic_slice(label, tuple(start), tuple(patch_shape))
    return img, lbl


@partial(jax.jit, static_argnames=("flip_axes", "noise_sigma", "window"))
def augment_batch(key, images, labels, flip_axes: Tuple[int, ...] = (),
                  noise_sigma: float = 0.0,
                  window: Optional[Tuple[float, float]] = None):
    """One fused kernel for the standard augmentation tail."""
    if window is not None:
        images = window_normalize(images, window[0], window[1])
    if flip_axes:
        kf, key = jax.random.split(key)
        images, labels = random_flip(kf, images, labels, flip_axes)
    if noise_sigma > 0.0:
        kn, _ = jax.random.split(key)
        images = random_noise(kn, images, noise_sigma)
    return images, labels
