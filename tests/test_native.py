"""Native runtime bindings: parity with the Python/scipy implementations."""

import os
import subprocess

import numpy as np
import pytest

from vnet_tpu import native
from vnet_tpu.infer import build_patch_grid

pytestmark = [
    pytest.mark.skipif(
        not (native.available() or native.build()),
        reason="native library not built and toolchain unavailable"),
    # part of the fast cross-subsystem smoke subset (pytest -m quick)
    pytest.mark.quick,
]


def test_version():
    assert native.available()


def test_window_normalize_matches_python(rng):
    from vnet_tpu.data.transforms3d import _window
    x = rng.normal(100, 200, size=(8, 8, 8)).astype(np.float32)
    got = native.window_normalize(x, 0.0, 600.0)
    expected = _window(x, 0.0, 600.0)
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_patch_grid_matches_python():
    starts_native = native.patch_grid((10, 8, 8), (4, 4, 4), (4, 4, 4))
    starts_py = build_patch_grid((10, 8, 8), (4, 4, 4), (4, 4, 4))
    np.testing.assert_array_equal(starts_native, starts_py)


def test_resample_matches_scipy(rng):
    from scipy import ndimage
    x = rng.normal(size=(9, 9, 9)).astype(np.float32)
    M = np.diag([1.5, 1.5, 1.5])
    offset = np.array([0.25, 0.0, -0.5])
    got = native.resample3d(x, (6, 6, 6), M, offset, nearest=False)
    expected = ndimage.affine_transform(x, M, offset, output_shape=(6, 6, 6),
                                        order=1, mode="constant", cval=0.0,
                                        prefilter=False)
    np.testing.assert_allclose(got, expected, atol=1e-4)

    got_nn = native.resample3d(x, (6, 6, 6), M, offset, nearest=True)
    expected_nn = ndimage.affine_transform(x, M, offset, output_shape=(6, 6, 6),
                                           order=0, mode="constant", cval=0.0,
                                           prefilter=False)
    # nearest ties can legitimately differ at exact .5 boundaries; these
    # offsets avoid them
    np.testing.assert_allclose(got_nn, expected_nn, atol=1e-5)


def test_extract_and_blend_matches_numpy(rng):
    vol = rng.normal(size=(8, 8, 8, 1)).astype(np.float32)
    starts = np.array([[0, 0, 0], [4, 4, 4], [2, 2, 2]], np.int64)
    patches = native.extract_patches(vol, (4, 4, 4), starts)
    assert patches.shape == (3, 4, 4, 4, 1)
    np.testing.assert_allclose(patches[2, ..., 0], vol[2:6, 2:6, 2:6, 0])

    acc = np.zeros((8, 8, 8, 2), np.float32)
    weight = np.zeros((8, 8, 8), np.float32)
    probs = rng.random((3, 4, 4, 4, 2)).astype(np.float32)
    window = np.ones((4, 4, 4), np.float32)
    native.blend_accumulate(acc, weight, probs, window, starts)

    exp_acc = np.zeros_like(acc)
    exp_w = np.zeros_like(weight)
    for i, s in enumerate(starts):
        sl = tuple(slice(int(a), int(a) + 4) for a in s)
        exp_acc[sl] += probs[i]
        exp_w[sl] += 1.0
    np.testing.assert_allclose(acc, exp_acc, rtol=1e-5)
    np.testing.assert_allclose(weight, exp_w, rtol=1e-5)


def test_native_cli_end_to_end(tmp_path, rng):
    """vnet_infer segments a bright cube via the threshold executor."""
    from vnet_tpu.io import MedicalImage, read_image, write_image
    exe = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc", "build", "vnet_infer")
    if not os.path.exists(exe):
        pytest.skip("vnet_infer binary not built")

    data = np.full((24, 24, 24), 10.0, np.float32)
    data[8:16, 8:16, 8:16] = 400.0
    inp = str(tmp_path / "in.nii.gz")
    outp = str(tmp_path / "out.nii.gz")
    write_image(MedicalImage(data), inp)
    subprocess.run([exe, inp, outp, "100", "16", "8", "2"], check=True,
                   capture_output=True)
    label = read_image(outp)
    assert label.GetSize() == (24, 24, 24)
    assert label.data[12, 12, 12] == 1
    assert label.data[2, 2, 2] == 0
