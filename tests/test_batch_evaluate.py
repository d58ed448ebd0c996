"""BatchEvaluate scoring/grid logic (reference utils/batch_evaluate)."""

import os

import numpy as np
import pytest

from vnet_tpu.config import parse_config
from vnet_tpu.io import MedicalImage, write_image
from vnet_tpu.utils import BatchEvaluate, GridResult, lesion_volume_buckets


@pytest.fixture
def eval_dir(tmp_path, rng):
    for i, shift in enumerate([0, 1]):
        case = tmp_path / "evaluate" / f"case_{i}"
        case.mkdir(parents=True)
        gt = np.zeros((16, 16, 16), np.uint8)
        gt[4:12, 4:12, 4:12] = 1
        pred = np.zeros_like(gt)
        pred[4 + shift:12 + shift, 4:12, 4:12] = 1
        write_image(MedicalImage(gt), str(case / "label.nii"))
        write_image(MedicalImage(pred), str(case / "label_out.nii.gz"))
    return str(tmp_path / "evaluate")


def make_be(eval_dir, **kw):
    cfg = parse_config({
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": "", "TestingDataDirectory": "",
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "PatchShape": [8, 8, 8],
            "Networks": {},
        },
        "EvaluationSetting": {
            "Data": {"EvaluateDataDirectory": eval_dir,
                     "LabelFilename": "label_out.nii.gz"},
            "Stride": [8, 8, 8],
        },
    })
    return BatchEvaluate(cfg, ground_truth_filename="label.nii", **kw)


def test_score_case(eval_dir):
    be = make_be(eval_dir, modes=("DICE", "ITEM"))
    s0 = be.score_case(os.path.join(eval_dir, "case_0"), "label_out.nii.gz")
    assert s0["DICE"] == pytest.approx(1.0)
    assert s0["TP"] == 1 and s0["FP"] == 0 and s0["FN"] == 0
    s1 = be.score_case(os.path.join(eval_dir, "case_1"), "label_out.nii.gz")
    assert 0.5 < s1["DICE"] < 1.0


def test_lesion_volume_buckets():
    """Golden values for the stride sweep's volume accounting
    (batch_evaluate_stride.py:55-86): ignore CCs below a 4pi/3 mm^3
    sphere, split small/large at 4pi*2.5^3/3 mm^3 (~65.45), and apply
    the bbox extent filter to output CCs only."""
    gt = np.zeros((24, 24, 24), np.uint8)
    gt[0:2, 0, 0] = 1            # 2 mm^3 < 4.19 -> ignored
    gt[4:7, 4:7, 4:7] = 1        # 27 mm^3 -> small bucket
    gt[12:17, 12:17, 12:17] = 1  # 125 mm^3 -> large bucket
    out = np.zeros_like(gt)
    out[18:23, 18:23, 0:5] = 1    # z extent 5 < 6 -> extent-filtered out
    out[0:2, 0:2, 0:6] = 1        # 24 mm^3, extents (2,2,6) -> small
    out[8:13, 8:13, 10:17] = 1    # 175 mm^3 -> large
    b = lesion_volume_buckets(MedicalImage(gt), MedicalImage(out))
    assert b == {"gt_vol_small": 27.0, "gt_vol_large": 125.0,
                 "label_vol_small": 24.0, "label_vol_large": 175.0}

    # physical semantics: same voxel counts, doubled spacing -> x8 volume
    gt2 = np.zeros((12, 12, 12), np.uint8)
    gt2[0:2, 0:2, 0:2] = 1  # 8 voxels x 8 mm^3 = 64 < 65.45 -> small
    gt2[6:9, 6:9, 6:9] = 1  # 27 voxels x 8 mm^3 = 216 -> large
    b2 = lesion_volume_buckets(MedicalImage(gt2, spacing=(2, 2, 2)),
                               MedicalImage(np.zeros_like(gt2)))
    assert b2["gt_vol_small"] == pytest.approx(64.0)
    assert b2["gt_vol_large"] == pytest.approx(216.0)
    assert b2["label_vol_small"] == 0.0 and b2["label_vol_large"] == 0.0


def test_score_case_volume_mode(eval_dir):
    be = make_be(eval_dir, modes=("DICE", "VOLUME"))
    s0 = be.score_case(os.path.join(eval_dir, "case_0"), "label_out.nii.gz")
    # one 8x8x8 cube = 512 mm^3 in both gt and output -> large bucket
    assert s0["gt_vol_large"] == pytest.approx(512.0)
    assert s0["label_vol_large"] == pytest.approx(512.0)
    assert s0["gt_vol_small"] == 0.0


def test_grid_result_csv_and_best(eval_dir, tmp_path):
    be = make_be(eval_dir)
    r1 = GridResult("ckpt_a", 8, 8,
                    {"case_0": {"DICE": 0.9}, "case_1": {"DICE": 0.7}})
    r2 = GridResult("ckpt_b", 8, 8, {"case_0": {"DICE": 0.95}})
    csv_path = str(tmp_path / "out" / "grid.csv")
    be.write_csv([r1, r2], csv_path)
    text = open(csv_path).read()
    assert "MEAN" in text and "ckpt_a" in text
    assert r1.mean("DICE") == pytest.approx(0.8)
    assert BatchEvaluate.best([r1, r2]).checkpoint == "ckpt_b"


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
