"""BASELINE scenario 3: multiclass (liver+tumor-style) training with
class-weighted Dice and ConfidenceCrop2 sampling, end to end."""

import json

import numpy as np
import pytest
import yaml

from fixtures import make_dataset_dir
from vnet_tpu.config import load_config
from vnet_tpu.infer import Evaluator
from vnet_tpu.io import read_image
from vnet_tpu.train import Trainer


def test_multiclass_confidence_crop_training(tmp_path, rng):
    patch = [16, 16, 16]
    train_dir, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                            num_cases=2, rng=rng,
                                            label_value=2)
    make_dataset_dir(str(tmp_path), "evaluate", num_cases=1, rng=rng)

    pipeline = {
        "preprocess": {
            "train": {"3D": [
                {"name": "ManualNormalization",
                 "variables": {"windowMin": 0, "windowMax": 200}},
                {"name": "Padding", "variables": {"output_size": patch}},
                {"name": "ConfidenceCrop2",
                 "variables": {"output_size": patch, "rand_range": 2,
                               "probability": 0.8}},
                {"name": "RandomNoise", "variables": {"sigma": 2}},
            ]},
            "test": {"3D": None},
            "evaluate": {"3D": [
                {"name": "ManualNormalization",
                 "variables": {"windowMin": 0, "windowMax": 200}},
                {"name": "Padding", "variables": {"output_size": patch}},
            ]},
        }
    }
    ppath = str(tmp_path / "pipe.yaml")
    with open(ppath, "w") as f:
        yaml.safe_dump(pipeline, f)

    tree = {
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": train_dir,
                     "TestingDataDirectory": train_dir,
                     "ImageFilenames": list(fnames),
                     "LabelFilename": "label.nii"},
            # labels file holds value 2 -> class index 2 via [0, 1, 2]
            "SegmentationClasses": [0, 1, 2],
            "LogDir": str(tmp_path / "log"),
            "CheckpointDir": str(tmp_path / "ckpt"),
            "BatchSize": 2,
            "PatchShape": patch,
            "MaxIterations": 2,
            "Epoches": 2,
            "LogInterval": 2,
            "Networks": {"Name": "VNet", "Dropout": 0.01, "NumChannel": 4,
                         "NumLevels": 2, "NumConvolutions": [1, 1],
                         "BottomConvolutions": 1},
            "Loss": {"Name": "weighted_sorensen",
                     "Weights": [0.01, 0.1, 1.0], "Alpha": 1},
            "Optimizer": {"Name": "Adam", "InitialLearningRate": 1e-3,
                          "Decay": {"Factor": 0.99, "Steps": 100}},
            "Pipeline": ppath,
        },
        "EvaluationSetting": {
            "Data": {"EvaluateDataDirectory": str(tmp_path / "evaluate"),
                     "ImageFilenames": list(fnames),
                     "LabelFilename": "label_mc.nii.gz",
                     "ProbabilityFilename": "prob.nii.gz"},
            "CheckpointPath": str(tmp_path / "ckpt"),
            "Stride": patch,
            "BatchSize": 2,
            "ProbabilityOutput": True,
            "GaussianBlend": True,
            "Pipeline": ppath,
        },
    }
    cpath = str(tmp_path / "config.json")
    with open(cpath, "w") as f:
        json.dump(tree, f)

    cfg = load_config(cpath)
    assert cfg.train.num_classes == 3
    state = Trainer(cfg, log=False).train()
    assert int(state.step) == 2

    # gaussian-blend multiclass eval with per-class probability outputs
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    assert len(results) == 1
    out = read_image(results[0])
    assert set(np.unique(out.data)) <= {0, 1, 2}
    for cls in (0, 1, 2):
        prob = read_image(str(tmp_path / "evaluate" / "case_0" /
                              f"prob_{cls}.nii.gz"))
        assert prob.GetSize() == out.GetSize()


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
