"""Offline tooling tests (reference utils/)."""

import numpy as np
import pytest

from vnet_tpu.io import MedicalImage, read_image, write_image
from vnet_tpu.utils import (Box, lesion_detection, nms, overlap_measures,
                            slice_boxes, volume_boxes)
from vnet_tpu.utils.prepare_data import (binarize_labels,
                                         check_header_consistency,
                                         fit_label_crop, lits_restructure,
                                         partition_z, unify_header)


def blob_image(positions, shape=(24, 24, 24), radius=2, spacing=(1., 1., 1.)):
    data = np.zeros(shape, np.uint8)
    for p in positions:
        sl = tuple(slice(max(c - radius, 0), c + radius) for c in p)
        data[sl] = 1
    return MedicalImage(data, spacing)


def test_overlap_measures_perfect():
    a = blob_image([(10, 10, 10)])
    m = overlap_measures(a, a)
    assert m["DICE"] == pytest.approx(1.0)
    assert m["Jaccard"] == pytest.approx(1.0)


def test_overlap_measures_partial():
    a = blob_image([(10, 10, 10)], radius=3)
    b = blob_image([(11, 10, 10)], radius=3)
    m = overlap_measures(a, b)
    assert 0.0 < m["DICE"] < 1.0
    assert m["Jaccard"] < m["DICE"]


def test_lesion_detection_tp_fp_fn():
    gt = blob_image([(6, 6, 12), (18, 18, 12)], radius=3)
    # one matched, one missed, one spurious
    out = blob_image([(6, 6, 12), (12, 18, 12)], radius=3)
    r = lesion_detection(gt, out, tolerance=3.0, thickness_threshold=3)
    assert r["TP"] == 1
    assert r["FN"] == 1
    assert r["FP"] == 1
    assert r["sensitivity"] == pytest.approx(0.5)


def test_lesion_detection_no_gt():
    gt = blob_image([])
    out = blob_image([(6, 6, 12)], radius=3)
    r = lesion_detection(gt, out, thickness_threshold=3)
    assert r["TP"] == 0 and r["FN"] == 0 and r["FP"] == 1


def test_lesion_thin_components_filtered():
    gt = blob_image([(12, 12, 12)], radius=3)
    out = MedicalImage(np.zeros((24, 24, 24), np.uint8))
    out.data[10:16, 10:16, 12] = 1  # 1-slice thick -> filtered
    r = lesion_detection(gt, out, thickness_threshold=6)
    assert r["FP"] == 0 and r["TP"] == 0 and r["FN"] == 1


def test_bbox_and_nms():
    sl = np.zeros((20, 20), np.uint8)
    sl[2:6, 2:6] = 1
    sl[10:18, 10:18] = 1
    boxes = slice_boxes(sl, 1)
    assert len(boxes) == 2
    kept = nms(boxes + boxes, 0.5)  # duplicates suppressed
    assert len(kept) == 2


def test_volume_boxes():
    img = blob_image([(10, 10, 5)], radius=3)
    boxes = volume_boxes(img, classes=[0, 1])
    assert 5 in boxes
    assert all(b.label == 1 for bs in boxes.values() for b in bs)


def test_lits_restructure(tmp_path):
    src = tmp_path / "flat"
    src.mkdir()
    img = MedicalImage(np.zeros((4, 4, 4), np.float32))
    write_image(img, str(src / "volume-3.nii"))
    write_image(img, str(src / "segmentation-3.nii"))
    moved = lits_restructure(str(src), str(tmp_path / "cases"))
    assert (tmp_path / "cases" / "3" / "image.nii").exists()
    assert (tmp_path / "cases" / "3" / "label.nii").exists()
    assert len(moved) == 2


def test_binarize_labels_with_mask():
    lbl = MedicalImage(np.zeros((10, 10, 10), np.uint8))
    lbl.data[2:5] = 1
    lbl.data[6:8] = 2
    img = MedicalImage(np.full((10, 10, 10), 7.0, np.float32))
    out, masked = binarize_labels(lbl, select_labels=[2], image=img,
                                  mask_labels=[1, 2], mask_dilation=1)
    assert set(np.unique(out.data)) == {0, 1}
    assert out.data[6, 0, 0] == 1 and out.data[2, 0, 0] == 0
    assert masked.data[0, 0, 0] == 0.0  # outside dilated mask
    assert masked.data[6, 5, 5] == 7.0


def test_unify_header():
    img = MedicalImage(np.zeros((4, 4, 4), np.float32), (2., 2., 2.), (1., 2., 3.))
    lbl = MedicalImage(np.ones((4, 4, 4), np.uint8))
    out = unify_header(img, lbl)
    assert out.spacing == img.spacing
    assert out.origin == img.origin


def test_check_header_consistency(tmp_path):
    case = tmp_path / "data" / "c1"
    case.mkdir(parents=True)
    img = MedicalImage(np.zeros((4, 4, 4), np.float32), (1., 1., 1.))
    bad = MedicalImage(np.zeros((4, 4, 4), np.uint8), (2., 2., 2.))
    write_image(img, str(case / "image.nii"))
    write_image(bad, str(case / "label.nii"))
    report = check_header_consistency(str(tmp_path / "data"))
    assert "c1" in report and "spacing" in report["c1"]


def test_partition_z():
    img = MedicalImage(np.zeros((8, 8, 150), np.float32))
    lbl = MedicalImage(np.zeros((8, 8, 150), np.uint8))
    parts = partition_z(img, lbl, layers=64)
    assert [p[0] for p in parts] == [0, 64, 128]
    assert parts[-1][1].GetSize() == (8, 8, 22)
    # chunk origin shifted along z
    assert parts[1][1].origin[2] == pytest.approx(64.0)


def test_fit_label_crop():
    img = MedicalImage(np.random.default_rng(0).normal(size=(20, 20, 20)).astype(np.float32))
    lbl = MedicalImage(np.zeros((20, 20, 20), np.uint8))
    lbl.data[8:12, 8:12, 8:12] = 1
    ci, cl = fit_label_crop(img, lbl, dilation=2)
    assert ci.GetSize() == (8, 8, 8)
    assert cl.data.sum() == lbl.data.sum()
    assert ci.origin == (6.0, 6.0, 6.0)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
