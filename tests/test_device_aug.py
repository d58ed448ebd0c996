"""Device-side augmentation unit tests (vnet_tpu/data/device_aug.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.data.device_aug import (augment_batch, random_crop_from_candidates,
                                      random_flip, random_noise,
                                      window_normalize)


def test_window_normalize_matches_host(rng):
    from vnet_tpu.data.transforms3d import _window
    x = rng.normal(100, 200, size=(2, 8, 8, 8, 1)).astype(np.float32)
    got = np.asarray(window_normalize(jnp.asarray(x), 0.0, 600.0))
    np.testing.assert_allclose(got, _window(x, 0.0, 600.0), atol=1e-3)


def test_random_flip_per_sample(rng):
    imgs = jnp.asarray(rng.normal(size=(4, 6, 6, 6, 1)).astype(np.float32))
    lbls = jnp.asarray(rng.integers(0, 2, (4, 6, 6, 6)).astype(np.int32))
    fi, fl = random_flip(jax.random.PRNGKey(0), imgs, lbls, axes=(0,))
    fi, fl = np.asarray(fi), np.asarray(fl)
    flipped = unchanged = 0
    for b in range(4):
        if np.allclose(fi[b], np.asarray(imgs)[b]):
            unchanged += 1
            np.testing.assert_array_equal(fl[b], np.asarray(lbls)[b])
        else:
            np.testing.assert_allclose(fi[b], np.asarray(imgs)[b, ::-1])
            np.testing.assert_array_equal(fl[b], np.asarray(lbls)[b, ::-1])
            flipped += 1
    assert flipped + unchanged == 4


def test_random_flip_same_key_consistent_for_distmaps(rng):
    """The attention train step flips distance maps with the SAME key as
    images/labels (trainer.py device_augment): identical per-sample coins,
    so every sample's (image, label, distmap) triple flips together."""
    imgs = jnp.asarray(rng.normal(size=(8, 6, 6, 6, 1)).astype(np.float32))
    lbls = jnp.asarray(rng.integers(0, 2, (8, 6, 6, 6)).astype(np.int32))
    dmaps = jnp.asarray(rng.normal(size=(8, 6, 6, 6)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    fi, fl = random_flip(key, imgs, lbls, axes=(0, 1))
    _, fd = random_flip(key, imgs, dmaps, axes=(0, 1))
    fi, fl, fd = np.asarray(fi), np.asarray(fl), np.asarray(fd)
    for b in range(8):
        if np.allclose(fi[b], np.asarray(imgs)[b]):
            np.testing.assert_array_equal(fd[b], np.asarray(dmaps)[b])
        else:
            np.testing.assert_allclose(fd[b],
                                       np.asarray(dmaps)[b, ::-1, ::-1])


def test_random_noise_stats(rng):
    x = jnp.zeros((2, 16, 16, 16, 1), jnp.float32)
    y = np.asarray(random_noise(jax.random.PRNGKey(1), x, sigma=5.0))
    assert abs(y.mean()) < 0.5
    assert 4.0 < y.std() < 6.0


def test_random_crop_from_candidates(rng):
    vol = jnp.asarray(rng.normal(size=(16, 16, 16, 2)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, 2, (16, 16, 16)).astype(np.int32))
    cands = jnp.asarray(np.array([[0, 0, 0], [8, 8, 8], [4, 2, 6]], np.int32))
    img, l = random_crop_from_candidates(jax.random.PRNGKey(2), vol, lbl,
                                         cands, (8, 8, 8))
    assert img.shape == (8, 8, 8, 2)
    assert l.shape == (8, 8, 8)
    # crop content matches one of the candidate corners
    matched = False
    for s in np.asarray(cands):
        ref = np.asarray(vol)[s[0]:s[0]+8, s[1]:s[1]+8, s[2]:s[2]+8]
        if np.allclose(np.asarray(img), ref):
            matched = True
    assert matched


def test_augment_batch_fused(rng):
    imgs = jnp.asarray(rng.normal(100, 50, (2, 8, 8, 8, 1)).astype(np.float32))
    lbls = jnp.zeros((2, 8, 8, 8), jnp.int32)
    out_i, out_l = augment_batch(jax.random.PRNGKey(3), imgs, lbls,
                                 flip_axes=(0, 2), noise_sigma=2.0,
                                 window=(0.0, 200.0))
    assert out_i.shape == imgs.shape
    oi = np.asarray(out_i)
    assert oi.min() >= -10.0 and oi.max() <= 265.0  # window + noise margin


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
