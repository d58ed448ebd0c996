"""Image-logging tests (reference grayscale_to_rainbow model.py:16-24 and
slice-wise TB logging)."""

import numpy as np
import pytest

from vnet_tpu.train.images import (grayscale_to_rainbow, label_to_uint8,
                                   log_batch_images, volume_to_slices)


def test_rainbow_endpoints():
    rgb = grayscale_to_rainbow(np.array([0.0, 1.0]))
    # v=0 -> H=2/3 -> blue; v=1 -> H=0 -> red
    np.testing.assert_allclose(rgb[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(rgb[1], [1, 0, 0], atol=1e-6)


def test_rainbow_shape_and_range(rng):
    x = rng.random((4, 5))
    rgb = grayscale_to_rainbow(x)
    assert rgb.shape == (4, 5, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_label_scaling():
    lbl = np.array([0, 1, 2])
    out = label_to_uint8(lbl, 3)
    np.testing.assert_array_equal(out, [0, 127, 254])


def test_volume_to_slices():
    v = np.zeros((4, 5, 6))
    assert volume_to_slices(v).shape == (6, 4, 5)


class FakeWriter:
    def __init__(self):
        self.calls = []

    def add_image(self, tag, img, step, dataformats=None):
        self.calls.append((tag, img.shape, step))


def test_log_batch_images_3d(rng):
    w = FakeWriter()
    B, S, C, K = 2, 6, 1, 2
    images = rng.random((B, S, S, S, C)) * 255
    labels = rng.integers(0, K, (B, S, S, S))
    softmax = rng.random((B, S, S, S, K)).astype(np.float32)
    pred = labels.copy()
    log_batch_images(w, "train", images, labels, softmax, pred, [0, 1],
                     step=5)
    tags = {t for t, _, _ in w.calls}
    assert any("input_0" in t for t in tags)
    assert any("label" in t for t in tags)
    assert any("softmax_1" in t for t in tags)
    assert any("pred" in t for t in tags)
    # all HWC uint8-compatible shapes
    assert all(len(s) == 3 and s[-1] == 3 for _, s, _ in w.calls)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
