"""2D transform tests (reference NiftiDataset2D.py:297-633)."""

import numpy as np
import pytest

from vnet_tpu.data import build_transform, transform_names
from vnet_tpu.data.rand import seed
from vnet_tpu.io import MedicalImage


@pytest.fixture(autouse=True)
def _seed():
    seed(99)


def make_sample(rng, shape=(20, 16), label_blob=True):
    img = MedicalImage(rng.normal(100, 20, size=shape).astype(np.float32),
                       (1.0, 1.0))
    lbl = np.zeros(shape, np.uint8)
    if label_blob:
        lbl[8:12, 6:10] = 1
    return {"image": [img], "label": MedicalImage(lbl, (1.0, 1.0))}


def test_registry_2d():
    expected = {"ManualNormalization", "Resample", "Padding", "RandomCrop",
                "RandomFlip", "RandomRotate", "RandomTranslate",
                "RadialDistortion"}
    assert expected <= set(transform_names(2))


def test_manual_normalization(rng):
    s = make_sample(rng)
    out = build_transform(2, "ManualNormalization",
                          {"windowMin": 0, "windowMax": 200})(s)
    d = out["image"][0].data
    assert 0.0 <= d.min() and d.max() <= 255.0


def test_resample_2d(rng):
    s = make_sample(rng)
    out = build_transform(2, "Resample", {"voxel_size": [2.0, 2.0]})(s)
    assert out["image"][0].GetSize() == (10, 8)
    assert out["label"].data.dtype == np.uint8


def test_padding_2d(rng):
    s = make_sample(rng, shape=(10, 8))
    out = build_transform(2, "Padding", {"output_size": [16, 16]})(s)
    assert out["image"][0].GetSize() == (16, 16)


def test_random_crop_2d(rng):
    s = make_sample(rng)
    out = build_transform(2, "RandomCrop",
                          {"output_size": [8, 8], "drop_ratio": 0.0,
                           "min_pixel": 4})(s)
    assert out["image"][0].GetSize() == (8, 8)
    assert out["label"].data.sum() >= 4


def test_random_crop_2d_sparse_slice_short_circuits(rng):
    # slice with fewer labeled pixels than min_pixel: any crop accepted
    s = make_sample(rng, label_blob=False)
    out = build_transform(2, "RandomCrop",
                          {"output_size": [8, 8], "drop_ratio": 0.0,
                           "min_pixel": 5})(s)
    assert out["image"][0].GetSize() == (8, 8)


def test_random_flip_2d(rng):
    s = make_sample(rng)
    orig = s["image"][0].data.copy()
    changed = False
    for _ in range(10):
        s2 = {"image": [s["image"][0].like(orig.copy())],
              "label": s["label"].like(s["label"].data.copy())}
        out = build_transform(2, "RandomFlip", {})(s2)
        if not np.allclose(out["image"][0].data, orig):
            changed = True
    assert changed


def test_random_rotate_2d(rng):
    s = make_sample(rng)
    out = build_transform(2, "RandomRotate", {})(s)
    assert out["image"][0].GetSize() == (20, 16)
    assert set(np.unique(out["label"].data)) <= {0, 1}


def test_random_translate_2d(rng):
    s = make_sample(rng)
    out = build_transform(2, "RandomTranslate", {"maxOffset": [3, 3]})(s)
    assert out["image"][0].GetSize() == (20, 16)


def test_radial_distortion_identity(rng):
    s = make_sample(rng)
    orig = s["image"][0].data.copy()
    out = build_transform(2, "RadialDistortion", {})(s)
    np.testing.assert_allclose(out["image"][0].data, orig)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
