"""BatchEvaluate scoring/grid logic (reference utils/batch_evaluate)."""

import os

import numpy as np
import pytest

from vnet_tpu.config import parse_config
from vnet_tpu.io import MedicalImage, write_image
from vnet_tpu.utils import BatchEvaluate, GridResult


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
