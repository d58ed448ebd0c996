"""3D transform semantics tests (reference NiftiDataset3D.py:167-837)."""

import numpy as np
import pytest

from vnet_tpu.data import build_transform, transform_names
from vnet_tpu.data.rand import seed
from vnet_tpu.io import MedicalImage


@pytest.fixture(autouse=True)
def _seed():
    seed(1234)


def make_sample(rng, shape=(16, 16, 12), channels=1, label_blob=True):
    images = [MedicalImage(rng.normal(100, 20, size=shape).astype(np.float32),
                           (1.0, 1.0, 1.5)) for _ in range(channels)]
    label = np.zeros(shape, np.uint8)
    if label_blob:
        label[6:10, 6:10, 4:8] = 1
    return {"image": images, "label": MedicalImage(label, (1.0, 1.0, 1.5))}


def test_registry_has_all_reference_transforms():
    expected = {"Normalization", "RandomFlip", "StatisticalNormalization",
                "ExtremumNormalization", "ManualNormalization", "Reorient",
                "Invert", "Resample", "Padding", "RandomCrop", "RandomNoise",
                "ConfidenceCrop", "ConfidenceCrop2", "BSplineDeformation"}
    assert expected <= set(transform_names(3))


def test_normalization_range(rng):
    s = make_sample(rng)
    out = build_transform(3, "Normalization", {})(s)
    d = out["image"][0].data
    assert d.min() == pytest.approx(0.0, abs=1e-3)
    assert d.max() == pytest.approx(255.0, abs=1e-3)


def test_manual_normalization_windows(rng):
    s = make_sample(rng)
    s["image"][0].data[0, 0, 0] = -500.0
    s["image"][0].data[1, 0, 0] = 900.0
    s["image"][0].data[2, 0, 0] = 300.0  # mid-window
    out = build_transform(3, "ManualNormalization",
                          {"windowMin": 0, "windowMax": 600})(s)
    d = out["image"][0].data
    assert d[0, 0, 0] == 0.0
    assert d[1, 0, 0] == 255.0
    assert d[2, 0, 0] == pytest.approx(127.5, abs=0.1)


def test_statistical_normalization(rng):
    s = make_sample(rng)
    out = build_transform(3, "StatisticalNormalization", {"sigma": 2.5})(s)
    d = out["image"][0].data
    assert 0.0 <= d.min() and d.max() <= 255.0


def test_random_flip_all_or_nothing(rng):
    s = make_sample(rng)
    orig = s["image"][0].data.copy()
    lbl = s["label"].data.copy()
    flipped_any = False
    for _ in range(10):
        s2 = {"image": [s["image"][0].like(orig.copy())],
              "label": s["label"].like(lbl.copy())}
        out = build_transform(3, "RandomFlip", {"axes": [True, False, False]})(s2)
        d = out["image"][0].data
        if not np.allclose(d, orig):
            np.testing.assert_allclose(d, orig[::-1])
            np.testing.assert_array_equal(out["label"].data, lbl[::-1])
            flipped_any = True
    assert flipped_any


def test_resample_spacing(rng):
    s = make_sample(rng)
    out = build_transform(3, "Resample", {"voxel_size": [2.0, 2.0, 3.0]})(s)
    assert out["image"][0].spacing == (2.0, 2.0, 3.0)
    assert out["image"][0].GetSize() == (8, 8, 6)
    assert out["label"].spacing == (2.0, 2.0, 3.0)
    # label stays integer under nearest-neighbour
    assert out["label"].data.dtype == np.uint8
    assert set(np.unique(out["label"].data)) <= {0, 1}


def test_padding(rng):
    s = make_sample(rng, shape=(10, 20, 8))
    out = build_transform(3, "Padding", {"output_size": [16, 16, 16]})(s)
    assert out["image"][0].GetSize() == (16, 20, 16)
    assert out["label"].GetSize() == (16, 20, 16)


def test_random_crop_contains_label(rng):
    s = make_sample(rng)
    out = build_transform(3, "RandomCrop",
                          {"output_size": [8, 8, 8], "drop_ratio": 0.0,
                           "min_pixel": 10})(s)
    assert out["image"][0].GetSize() == (8, 8, 8)
    assert out["label"].data.sum() >= 10


def test_random_crop_empty_label_accepted(rng):
    s = make_sample(rng, label_blob=False)
    out = build_transform(3, "RandomCrop",
                          {"output_size": [8, 8, 8], "drop_ratio": 1.0,
                           "min_pixel": 1})(s)
    assert out["image"][0].GetSize() == (8, 8, 8)


def test_random_noise(rng):
    s = make_sample(rng)
    orig = s["image"][0].data.copy()
    out = build_transform(3, "RandomNoise", {"sigma": 5})(s)
    diff = out["image"][0].data - orig
    assert abs(diff.mean()) < 1.0
    assert 3.0 < diff.std() < 7.0
    # label untouched
    assert out["label"].data.max() == 1


def test_confidence_crop_centers_near_label(rng):
    s = make_sample(rng, shape=(24, 24, 24))
    out = build_transform(3, "ConfidenceCrop",
                          {"output_size": [12, 12, 12], "sigma": 0.01})(s)
    assert out["image"][0].GetSize() == (12, 12, 12)
    # tiny sigma -> crop centered on the blob -> label present
    assert out["label"].data.sum() > 0


def test_confidence_crop2_positive(rng):
    s = make_sample(rng, shape=(24, 24, 24))
    out = build_transform(3, "ConfidenceCrop2",
                          {"output_size": [12, 12, 12], "rand_range": 1,
                           "probability": 1.0})(s)
    assert out["image"][0].GetSize() == (12, 12, 12)
    assert out["label"].data.sum() > 0


def test_confidence_crop2_negative_empty_region(rng):
    s = make_sample(rng, shape=(24, 24, 24))
    out = build_transform(3, "ConfidenceCrop2",
                          {"output_size": [8, 8, 8], "rand_range": 1,
                           "probability": 0.0, "random_empty_region": True})(s)
    assert out["label"].data.sum() == 0


def test_bspline_deformation(rng):
    s = make_sample(rng, shape=(16, 16, 16))
    orig = s["image"][0].data.copy()
    out = build_transform(3, "BSplineDeformation", {"randomness": 4})(s)
    assert out["image"][0].GetSize() == (16, 16, 16)
    assert not np.allclose(out["image"][0].data, orig)
    assert set(np.unique(out["label"].data)) <= {0, 1}


def test_invert(rng):
    s = make_sample(rng)
    orig = s["image"][0].data.copy()
    out = build_transform(3, "Invert", {})(s)
    np.testing.assert_allclose(out["image"][0].data, 255.0 - orig, rtol=1e-5)


def test_reorient(rng):
    s = make_sample(rng, shape=(8, 10, 12))
    out = build_transform(3, "Reorient", {"order": [2, 0, 1]})(s)
    assert out["image"][0].GetSize() == (12, 8, 10)
    assert out["label"].GetSize() == (12, 8, 10)
    assert out["image"][0].spacing == (1.5, 1.0, 1.0)


def test_unknown_transform_raises():
    with pytest.raises(ValueError):
        build_transform(3, "NoSuchTransform", {})


def test_crop_updates_origin(rng):
    """RegionOfInterest shifts the origin so physical geometry stays
    consistent (needed for eval restore)."""
    s = make_sample(rng)
    out = build_transform(3, "ConfidenceCrop2",
                          {"output_size": [8, 8, 8], "rand_range": 1,
                           "probability": 1.0})(s)
    img = out["image"][0]
    assert img.origin != (0.0, 0.0, 0.0)


def test_cc_memo_matches_scipy_direct(rng):
    """The per-case CC memo (bboxes + centroids) returns exactly what
    direct scipy labeling computes, and repeat calls hit the memo."""
    from scipy import ndimage

    from vnet_tpu.data.transforms3d import (_cc_bboxes, _cc_centroids,
                                            _cc_objs_memo)

    binary = np.zeros((20, 20, 20), bool)
    binary[2:5, 2:5, 2:5] = True
    binary[10:14, 11:13, 3:9] = True
    binary[17:19, 1:3, 15:20] = True

    cc, ncc = ndimage.label(binary)
    n, bboxes = _cc_bboxes(binary)
    assert n == ncc == 3
    assert list(bboxes) == ndimage.find_objects(cc)
    n, cents = _cc_centroids(binary)
    assert n == 3
    for got, want in zip(cents,
                         (ndimage.center_of_mass(cc == i) for i in (1, 2, 3))):
        np.testing.assert_allclose(got, want)

    before = len(_cc_objs_memo)
    _cc_bboxes(binary)  # second call: memo hit, no growth
    assert len(_cc_objs_memo) == before


def test_random_crop_integral_fallback_matches(rng):
    """Hot-rejection crops (many misses before accept) route through the
    lazily-built integral image; acceptance must match the direct count."""
    from vnet_tpu.data import rand as vrand
    from vnet_tpu.data.transforms3d import RandomCrop

    lbl = np.zeros((40, 40, 40), np.uint8)
    lbl[:6, :6, :6] = 1  # 216 voxels in one corner
    img = MedicalImage(np.zeros((40, 40, 40), np.float32))
    s = {"image": [img], "label": MedicalImage(lbl)}
    t = RandomCrop([16, 16, 16], drop_ratio=0.0, min_pixel=200)
    vrand.seed(11)
    out = t(s)
    # drop_ratio 0 means the accepted crop MUST contain >=200 label voxels,
    # regardless of whether the direct or integral path judged it
    assert int((out["label"].data >= 1).sum()) >= 200


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
