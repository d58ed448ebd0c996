"""NIfTI I/O + geometry round-trip tests.

Covers the header fidelity requirements the reference gets from SimpleITK
(`/root/reference/pipeline/NiftiDataset3D.py:79-116` header consistency;
`/root/reference/model.py:946-977` origin/direction/spacing restore).
"""

import numpy as np
import pytest

from vnet_tpu.io import (MedicalImage, read_image, resample_like,
                         resample_to_spacing, pad_to_size, write_image,
                         zeros_like_geometry)


def make_image(rng, shape=(7, 6, 5), spacing=(1.5, 2.0, 2.5),
               origin=(-10.0, 4.0, 7.5), dtype=np.float32):
    data = rng.normal(size=shape).astype(dtype)
    return MedicalImage(data, spacing, origin)


def test_roundtrip_nii(tmp_path, rng):
    img = make_image(rng)
    path = str(tmp_path / "img.nii")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_allclose(back.data, img.data, rtol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing, atol=1e-5)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)
    np.testing.assert_allclose(back.direction, img.direction, atol=1e-5)


def test_roundtrip_nii_gz_int(tmp_path, rng):
    data = rng.integers(0, 4, size=(6, 5, 4)).astype(np.uint8)
    img = MedicalImage(data, (1.0, 1.0, 3.0), (1.0, 2.0, 3.0))
    path = str(tmp_path / "label.nii.gz")
    write_image(img, path)
    back = read_image(path)
    assert back.data.dtype == np.uint8
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_allclose(back.spacing, img.spacing, atol=1e-5)


def test_roundtrip_nondiagonal_direction(tmp_path, rng):
    # 90-degree rotation about z as the direction matrix
    direction = (0.0, -1.0, 0.0,
                 1.0, 0.0, 0.0,
                 0.0, 0.0, 1.0)
    img = MedicalImage(rng.normal(size=(4, 5, 6)).astype(np.float32),
                       (1.0, 1.25, 1.5), (3.0, -2.0, 9.0), direction)
    path = str(tmp_path / "rot.nii")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_allclose(back.direction, direction, atol=1e-5)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)
    np.testing.assert_allclose(back.data, img.data, rtol=1e-6)


def test_physical_point_roundtrip(rng):
    img = make_image(rng)
    idx = (3, 2, 1)
    p = img.TransformIndexToPhysicalPoint(idx)
    assert img.TransformPhysicalPointToIndex(p) == idx
    # spot check: index 0 is the origin
    assert img.TransformIndexToPhysicalPoint((0, 0, 0)) == pytest.approx(img.origin)


def test_zeros_like_geometry(rng):
    img = make_image(rng)
    lbl = zeros_like_geometry(img)
    assert lbl.data.dtype == np.uint8
    assert lbl.GetSize() == img.GetSize()
    assert lbl.spacing == img.spacing
    assert not lbl.data.any()


def test_resample_to_spacing_identity(rng):
    img = make_image(rng, shape=(8, 8, 8), spacing=(2.0, 2.0, 2.0))
    out = resample_to_spacing(img, (2.0, 2.0, 2.0))
    assert out.GetSize() == (8, 8, 8)
    np.testing.assert_allclose(out.data, img.data, rtol=1e-5)


def test_resample_to_spacing_downsample_size():
    # size follows ceil(old_spacing*old_size/new_spacing):
    # ceil(1.0*10/2.0)=5  (NiftiDataset3D.py:375-378)
    img = MedicalImage(np.arange(1000, dtype=np.float32).reshape(10, 10, 10))
    out = resample_to_spacing(img, (2.0, 2.0, 2.0))
    assert out.GetSize() == (5, 5, 5)
    assert out.spacing == (2.0, 2.0, 2.0)
    # nearest grid point of out index (1,1,1) is input index (2,2,2)
    assert out.data[1, 1, 1] == pytest.approx(img.data[2, 2, 2])


def test_resample_linear_interpolates():
    img = MedicalImage(np.arange(8, dtype=np.float32).reshape(2, 2, 2))
    out = resample_to_spacing(img, (0.5, 1.0, 1.0))
    # out index 1 along x maps to continuous input x=0.5: average along x
    assert out.data[1, 0, 0] == pytest.approx(
        0.5 * (img.data[0, 0, 0] + img.data[1, 0, 0]))


def test_pad_to_size(rng):
    img = make_image(rng, shape=(4, 9, 5))
    out = pad_to_size(img, (8, 8, 8))
    # per-axis max(output, current): y keeps its 9 (NiftiDataset3D.py:428-435)
    assert out.GetSize() == (8, 9, 8)
    np.testing.assert_allclose(out.data[:4, :9, :5], img.data, rtol=1e-5)
    assert not out.data[4:, :, :].any()


def test_resample_like_roundtrip(rng):
    # resample fine -> coarse -> restore grid keeps labels where they were
    lbl = np.zeros((12, 12, 12), dtype=np.uint8)
    lbl[4:8, 4:8, 4:8] = 1
    img = MedicalImage(lbl, (1.0, 1.0, 1.0))
    coarse = resample_to_spacing(img, (2.0, 2.0, 2.0), interpolator="nearest")
    back = resample_like(coarse, img, interpolator="nearest")
    assert back.GetSize() == img.GetSize()
    # centre voxel must survive the round trip
    assert back.data[5, 5, 5] == 1
    assert back.data[0, 0, 0] == 0


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick


def test_resample_identity_grid_fast_path():
    """Identical target geometry returns the data unchanged (bitwise for
    nearest; float-promoted for linear, matching the interpolating path)."""
    from vnet_tpu.io.resample import LINEAR, NEAREST, resample_like

    rng = np.random.default_rng(3)
    img = MedicalImage(rng.integers(0, 7, size=(9, 8, 7)).astype(np.uint8),
                       spacing=(0.7, 0.7, 2.5), origin=(1.0, -2.0, 3.0))
    ref = MedicalImage(np.zeros((9, 8, 7), np.uint8),
                       spacing=(0.7, 0.7, 2.5), origin=(1.0, -2.0, 3.0))
    out_n = resample_like(img, ref, NEAREST)
    np.testing.assert_array_equal(out_n.data, img.data)
    assert out_n.data.dtype == np.uint8
    out_l = resample_like(img, ref, LINEAR)
    np.testing.assert_array_equal(out_l.data, img.data.astype(np.float32))
    # the fast path must copy, not alias, the input buffer
    assert not np.shares_memory(out_n.data, img.data)

    # a shifted grid must still interpolate, not alias
    ref2 = MedicalImage(np.zeros((9, 8, 7), np.uint8),
                        spacing=(0.7, 0.7, 2.5), origin=(1.0, -2.0, 3.7))
    out_s = resample_like(img, ref2, NEAREST)
    assert not np.array_equal(out_s.data, img.data)
