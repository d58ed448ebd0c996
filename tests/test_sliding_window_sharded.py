"""Mesh-sharded sliding-window inference equals the single-device result
(patch grid split over the data axis, psum-assembled blend)."""

import jax.numpy as jnp
import numpy as np

from vnet_tpu.infer import SlidingWindowInference
from vnet_tpu.parallel import make_mesh


def apply_fn(variables, patches):
    v = patches[..., 0]
    return jnp.stack([jnp.zeros_like(v), v], axis=-1)


def test_sharded_matches_unsharded(rng):
    vol = rng.normal(size=(8, 8, 8, 1)).astype(np.float32)
    single = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 2, 2),
                                    batch_size=2, num_classes=2)
    acc_s, w_s = single({}, vol)

    mesh = make_mesh(8, 1)
    sharded = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 2, 2),
                                     batch_size=2, num_classes=2, mesh=mesh)
    acc_m, w_m = sharded({}, vol)

    # padded duplicate tail patches may add extra weight; compare the
    # blended (normalized) fields and the argmax instead of raw sums
    p_s = np.asarray(acc_s) / np.asarray(w_s)[..., None]
    p_m = np.asarray(acc_m) / np.asarray(w_m)[..., None]
    np.testing.assert_allclose(p_m, p_s, rtol=1e-4)
    np.testing.assert_array_equal(np.argmax(np.asarray(acc_m), -1),
                                  np.argmax(np.asarray(acc_s), -1))


def test_sharded_gaussian_blend(rng):
    vol = rng.normal(size=(8, 8, 8, 1)).astype(np.float32)
    mesh = make_mesh(4, 1)
    eng = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 2, 2),
                                 batch_size=2, num_classes=2, mesh=mesh,
                                 gaussian_blend=True)
    acc, w = eng({}, vol)
    assert np.asarray(w).min() > 0


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
