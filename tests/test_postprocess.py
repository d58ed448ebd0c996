"""Post-processing tests (reference model.py:117-167)."""

import numpy as np

from vnet_tpu.infer import extract_largest_connected_component, volume_threshold
from vnet_tpu.io import MedicalImage


def two_blobs(spacing=(1.0, 1.0, 1.0)):
    data = np.zeros((20, 20, 20), np.uint8)
    data[2:8, 2:8, 2:8] = 1      # 216 voxels
    data[12:15, 12:15, 12:15] = 1  # 27 voxels
    return MedicalImage(data, spacing)


def test_lcc_keeps_largest():
    out = extract_largest_connected_component(two_blobs())
    assert out.data[4, 4, 4] == 1
    assert out.data[13, 13, 13] == 0
    assert out.data.sum() == 216


def test_lcc_empty():
    img = MedicalImage(np.zeros((5, 5, 5), np.uint8))
    out = extract_largest_connected_component(img)
    assert out.data.sum() == 0


def test_volume_threshold_physical_units():
    # spacing 2mm -> voxel 8 mm^3; small blob 27*8=216 mm^3, big 216*8=1728
    img = two_blobs(spacing=(2.0, 2.0, 2.0))
    out = volume_threshold(img, 300.0)
    assert out.data[4, 4, 4] == 1
    assert out.data[13, 13, 13] == 0
    out = volume_threshold(img, 100.0)
    assert out.data[13, 13, 13] == 1  # both survive


def test_volume_threshold_multiclass_binarizes():
    data = np.zeros((10, 10, 10), np.uint8)
    data[1:5, 1:5, 1:5] = 2  # nonzero counts as foreground
    out = volume_threshold(MedicalImage(data), 10.0)
    assert out.data[2, 2, 2] == 1


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
