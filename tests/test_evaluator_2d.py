"""2D slice-wise evaluation path (reference model.py:979-1129)."""

import json

import numpy as np
import pytest
import yaml

from fixtures import make_dataset_dir
from vnet_tpu.config import load_config
from vnet_tpu.infer import Evaluator
from vnet_tpu.io import read_image
from vnet_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained2d(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("eval2d")
    rng = np.random.default_rng(11)
    train_dir, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                            num_cases=2, rng=rng)
    test_dir, _, _ = make_dataset_dir(str(tmp_path), "testing", num_cases=1,
                                      rng=rng)
    make_dataset_dir(str(tmp_path), "evaluate", num_cases=1, rng=rng)

    patch = [16, 16]
    pipeline = {
        "preprocess": {
            "train": {"3D": None, "2D": [
                {"name": "ManualNormalization",
                 "variables": {"windowMin": 0, "windowMax": 200}},
                {"name": "Padding", "variables": {"output_size": patch}},
                {"name": "RandomCrop",
                 "variables": {"output_size": patch, "drop_ratio": 1.0,
                               "min_pixel": 1}},
            ]},
            "test": {"3D": None, "2D": None},
            "evaluate": {"3D": None, "2D": [
                {"name": "ManualNormalization",
                 "variables": {"windowMin": 0, "windowMax": 200}},
                {"name": "Padding", "variables": {"output_size": patch}},
            ]},
        }
    }
    ppath = str(tmp_path / "pipeline2d.yaml")
    with open(ppath, "w") as f:
        yaml.safe_dump(pipeline, f)

    cfg_tree = {
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": train_dir,
                     "TestingDataDirectory": test_dir,
                     "ImageFilenames": list(fnames),
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1],
            "LogDir": str(tmp_path / "log"),
            "CheckpointDir": str(tmp_path / "ckpt"),
            "BatchSize": 4,
            "PatchShape": patch,
            "MaxIterations": 2,
            "Epoches": 1,
            "LogInterval": 2,
            "MinPixel": 5,
            "DropRatio": 0.0,
            "Networks": {"Name": "VNet", "Dropout": 0.01, "NumChannel": 4,
                         "NumLevels": 2, "NumConvolutions": [1, 1],
                         "BottomConvolutions": 1},
            "Loss": {"Name": "sorensen", "Weights": [], "Alpha": 1},
            "Optimizer": {"Name": "Adam", "InitialLearningRate": 1e-3,
                          "Decay": {"Factor": 0.99, "Steps": 100}},
            "Pipeline": ppath,
        },
        "EvaluationSetting": {
            "Data": {"EvaluateDataDirectory": str(tmp_path / "evaluate"),
                     "ImageFilenames": list(fnames),
                     "LabelFilename": "label_out.nii.gz",
                     "ProbabilityFilename": "probability.nii.gz"},
            "CheckpointPath": str(tmp_path / "ckpt"),
            "Stride": patch,
            "BatchSize": 4,
            "ProbabilityOutput": False,
            "Pipeline": ppath,
        },
    }
    cpath = str(tmp_path / "config2d.json")
    with open(cpath, "w") as f:
        json.dump(cfg_tree, f)

    cfg = load_config(cpath)
    assert cfg.train.dimension == 2
    trainer = Trainer(cfg, log=False)
    state = trainer.train()
    return cfg, state, tmp_path


def test_2d_training_ran(trained2d):
    cfg, state, _ = trained2d
    assert int(state.step) == 2


def test_2d_evaluation_writes_volume(trained2d):
    cfg, state, tmp_path = trained2d
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    assert len(results) == 1
    out = read_image(results[0])
    src = read_image(str(tmp_path / "evaluate" / "case_0" / "image.nii"))
    assert out.GetSize() == src.GetSize()
    assert set(np.unique(out.data)) <= {0, 1}


def test_2d_stacked_engine_matches_per_slice_fallback(trained2d):
    """The slice-stacked single-dispatch path must produce bit-identical
    outputs to the per-slice fallback loop (same math, one dispatch)."""
    cfg, state, tmp_path = trained2d
    cfg.evaluate.probability_output = True

    ev = Evaluator(cfg, state=state)
    assert ev.engine_stacked is not None
    case_dir = str(tmp_path / "evaluate" / "case_0")
    label_s, probs_s = ev.evaluate_case(case_dir)

    ev.engine_stacked = None  # force the per-slice loop
    label_l, probs_l = ev.evaluate_case(case_dir)

    np.testing.assert_array_equal(np.asarray(label_s.data),
                                  np.asarray(label_l.data))
    for ps, pl in zip(probs_s, probs_l):
        np.testing.assert_allclose(np.asarray(ps.data), np.asarray(pl.data),
                                    rtol=1e-5, atol=1e-6)
    cfg.evaluate.probability_output = False
