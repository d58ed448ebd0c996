"""End-to-end training smoke tests on a virtual 8-device CPU mesh
(reference train loop semantics model.py:632-815)."""

import json
import os

import jax
import numpy as np
import pytest
import yaml

from fixtures import make_dataset_dir
from vnet_tpu.config import load_config
from vnet_tpu.train import Trainer


def write_config(tmp_path, rng, batch_size=2, patch=(16, 16, 16),
                 max_iterations=3, num_cases=2, testing=False, **overrides):
    train_dir, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                            num_cases=num_cases, rng=rng)
    test_dir, _, _ = make_dataset_dir(str(tmp_path), "testing",
                                      num_cases=1, rng=rng)
    base = [
        {"name": "ManualNormalization",
         "variables": {"windowMin": 0, "windowMax": 200}},
        {"name": "Padding", "variables": {"output_size": list(patch)}},
    ]
    crop = [{"name": "RandomCrop",
             "variables": {"output_size": list(patch), "drop_ratio": 1.0,
                           "min_pixel": 1}}]
    pipeline = {
        "preprocess": {
            "train": {"3D": base + crop},
            "test": {"3D": base + crop},
            # evaluation keeps full volumes (pipeline3D.yaml:36-50)
            "evaluate": {"3D": base},
        }
    }
    ppath = str(tmp_path / "pipeline.yaml")
    with open(ppath, "w") as f:
        yaml.safe_dump(pipeline, f)

    cfg_tree = {
        "TrainingSetting": {
            "Data": {
                "TrainingDataDirectory": train_dir,
                "TestingDataDirectory": test_dir,
                "ImageFilenames": list(fnames),
                "LabelFilename": "label.nii",
            },
            "Restore": True,
            "SegmentationClasses": [0, 1],
            "LogDir": str(tmp_path / "log"),
            "CheckpointDir": str(tmp_path / "ckpt"),
            "BatchSize": batch_size,
            "PatchShape": list(patch),
            "Testing": testing,
            "TestStep": 2,
            "Epoches": 2,
            "MaxIterations": max_iterations,
            "LogInterval": 2,
            "Networks": {
                "Name": "VNet", "Dropout": 0.01, "NumChannel": 4,
                "NumLevels": 2, "NumCovolutions": [1, 1],  # typo on purpose
                "BottomConvolutions": 1,
            },
            "Loss": {"Name": "sorensen", "Weights": [], "Alpha": 1},
            "Optimizer": {
                "Name": "Adam", "InitialLearningRate": 1e-3,
                "Decay": {"Factor": 0.99, "Steps": 100},
            },
            "Spacing": [1.0, 1.0, 1.5],
            "DropRatio": 0.01,
            "MinPixel": 1,
            "Pipeline": ppath,
            **overrides,
        },
        "EvaluationSetting": {
            "Data": {
                "EvaluateDataDirectory": str(tmp_path / "evaluate"),
                "ImageFilenames": list(fnames),
                "LabelFilename": "label_out.nii.gz",
                "ProbabilityFilename": "probability.nii.gz",
            },
            "CheckpointPath": str(tmp_path / "ckpt"),
            "Stride": list(patch),
            "BatchSize": 2,
            "ProbabilityOutput": False,
            "Pipeline": ppath,
        },
    }
    cpath = str(tmp_path / "config.json")
    with open(cpath, "w") as f:
        json.dump(cfg_tree, f)
    return cpath


def test_config_parses_typo_alias(tmp_path, rng):
    cfg = load_config(write_config(tmp_path, rng))
    assert cfg.train.network.num_convolutions == (1, 1)
    assert cfg.train.dimension == 3
    assert cfg.train.num_classes == 2


@pytest.mark.quick
def test_single_train_step_decreases_nothing_weird(tmp_path, rng):
    cfg = load_config(write_config(tmp_path, rng))
    trainer = Trainer(cfg, log=False)
    state = trainer.init_state()
    images = rng.normal(size=trainer.batch_shape()).astype(np.float32)
    labels = (rng.random(trainer.batch_shape()[:-1]) > 0.7).astype(np.int32)
    key = jax.random.PRNGKey(0)
    state1, out1 = trainer.train_step(state, images, labels, key)
    assert np.isfinite(out1.loss)
    assert int(state1.step) == 1
    state2, out2 = trainer.train_step(state1, images, labels, key)
    assert int(state2.step) == 2
    assert "accuracy" in out2.metrics


def test_train_step_is_sharded_over_mesh(tmp_path, rng):
    cfg = load_config(write_config(tmp_path, rng, batch_size=8))
    trainer = Trainer(cfg, log=False)
    assert trainer.mesh.devices.size == 8
    state = trainer.init_state()
    images = rng.normal(size=trainer.batch_shape()).astype(np.float32)
    labels = np.zeros(trainer.batch_shape()[:-1], np.int32)
    state, out = trainer.train_step(state, images, labels,
                                    jax.random.PRNGKey(0))
    assert np.isfinite(out.loss)


def test_full_train_loop_and_resume(tmp_path, rng):
    cfg = load_config(write_config(tmp_path, rng, max_iterations=2))
    trainer = Trainer(cfg, log=False)
    state = trainer.train()
    assert int(state.step) == 2  # hit MaxIterations

    # resume: a new trainer restores step/epoch from checkpoint-latest
    trainer2 = Trainer(cfg, log=False)
    cfg.train.max_iterations = 3
    state2 = trainer2.train()
    assert int(state2.step) == 3


def test_ckpt_every_n_epochs_thins_epoch_saves(tmp_path, rng):
    """CheckpointEveryNEpochs=2 saves at epochs 2 and 4 only (1 step per
    epoch here; LogInterval is set high so step-interval saves don't
    confound). Default 1 keeps the reference's save-every-epoch parity."""
    cfg = load_config(write_config(
        tmp_path, rng, max_iterations=10,
        **{"Epoches": 4, "LogInterval": 100, "CheckpointEveryNEpochs": 2}))
    assert cfg.train.ckpt_every_n_epochs == 2
    trainer = Trainer(cfg, log=False)
    state = trainer.train()
    assert int(state.epoch) == 4
    saved = sorted(int(d) for d in os.listdir(str(tmp_path / "ckpt"))
                   if d.isdigit())
    assert saved == [2, 4]


def test_loss_decreases_over_steps(tmp_path, rng):
    """Learnable toy task: loss after 15 steps < first loss."""
    cfg = load_config(write_config(tmp_path, rng))
    trainer = Trainer(cfg, log=False)
    state = trainer.init_state()
    images = rng.normal(size=trainer.batch_shape()).astype(np.float32)
    labels = (images[..., 0] > 0.5).astype(np.int32)
    key = jax.random.PRNGKey(0)
    first = None
    for _ in range(15):
        state, out = trainer.train_step(state, images, labels, key)
        if first is None:
            first = out.loss
    assert out.loss < first


def test_restore_false_wipes_dirs(tmp_path, rng):
    cpath = write_config(tmp_path, rng, max_iterations=1)
    cfg = load_config(cpath)
    os.makedirs(cfg.train.log_dir, exist_ok=True)
    marker = os.path.join(cfg.train.log_dir, "stale.txt")
    with open(marker, "w") as f:
        f.write("old")
    cfg.train.restore = False
    Trainer(cfg, log=False).train()
    assert not os.path.exists(marker)  # model.py:678-687


def test_scan_steps_training(tmp_path, rng):
    """ScanSteps>1 runs K optimizer steps per jitted call with identical
    bookkeeping (step counter, logging cadence)."""
    cpath = write_config(tmp_path, rng, max_iterations=4, num_cases=4,
                         ScanSteps=2)
    cfg = load_config(cpath)
    assert cfg.train.scan_steps == 2
    trainer = Trainer(cfg, log=False)
    state = trainer.init_state()
    shape = trainer.batch_shape()
    sup_i = rng.normal(size=(2, *shape)).astype(np.float32)
    sup_l = (rng.random((2, *shape[:-1])) > 0.7).astype(np.int32)
    state, outs = trainer.train_steps_scanned(state, sup_i, sup_l,
                                              jax.random.PRNGKey(0))
    assert len(outs) == 2
    assert int(state.step) == 2
    assert all(np.isfinite(float(o.loss)) for o in outs)


def test_scan_steps_full_loop(tmp_path, rng):
    cpath = write_config(tmp_path, rng, max_iterations=2, num_cases=4,
                         ScanSteps=2)
    cfg = load_config(cpath)
    state = Trainer(cfg, log=False).train()
    assert int(state.step) == 2


def test_device_augment(tmp_path, rng):
    """DeviceAugment moves flip/noise into the jitted step; host chain
    keeps only the geometry transforms."""
    cpath = write_config(tmp_path, rng, max_iterations=2,
                         DeviceAugment=True)
    import json as _json
    with open(cpath) as f:
        tree = _json.load(f)
    # add flip+noise to the train pipeline
    ppath = tree["TrainingSetting"]["Pipeline"]
    import yaml as _yaml
    with open(ppath) as f:
        pipe = _yaml.safe_load(f)
    pipe["preprocess"]["train"]["3D"] += [
        {"name": "RandomFlip", "variables": {"axes": [True, False, False]}},
        {"name": "RandomNoise", "variables": {"sigma": 3}},
    ]
    with open(ppath, "w") as f:
        _yaml.safe_dump(pipe, f)

    cfg = load_config(cpath)
    assert cfg.train.device_augment
    trainer = Trainer(cfg, log=False)
    loader = trainer.build_loader(cfg.train.data_dir, "train")
    names = [t.name for t in loader.dataset.transforms]
    assert "Flip" not in names and "Random Noise" not in names
    assert trainer._device_aug == ((0,), 3.0)
    state = trainer.train()
    assert int(state.step) == 2


def test_test_phase_scalars_and_images(tmp_path, rng):
    # inline test every TestStep with ImageLog writes scalars AND images to
    # the second ("test") writer (model.py:767-794); BatchSize 1 because the
    # fixture test split has one case
    cfg = load_config(write_config(tmp_path, rng, testing=True,
                                   batch_size=1, max_iterations=2,
                                   ImageLog=True))

    class FakeWriter:
        def __init__(self):
            self.scalars, self.images = [], []

        def add_scalar(self, *a, **k):
            self.scalars.append(a)

        def add_image(self, *a, **k):
            self.images.append(a)

    writers = {}
    trainer = Trainer(cfg, log=True)
    trainer._writer = lambda tag: writers.setdefault(tag, FakeWriter())
    trainer.train()
    assert writers["train"].scalars
    assert writers["test"].scalars, "inline test step never ran"
    assert writers["test"].images, "test-phase ImageLog wrote no images"


def test_empty_test_loader_disables_inline_testing(tmp_path, rng, capsys):
    # 1 test case with BatchSize 2 + drop_remainder -> zero test batches;
    # training must continue instead of crashing with StopIteration
    cfg = load_config(write_config(tmp_path, rng, testing=True,
                                   max_iterations=2))
    trainer = Trainer(cfg, log=False)
    state = trainer.train()
    assert int(state.step) == 2
    assert "disabling inline testing" in capsys.readouterr().out


@pytest.mark.quick
def test_train_raises_when_batch_exceeds_cases(tmp_path, rng):
    # drop_remainder + cases < BatchSize must fail loudly, not silently
    # train nothing (found by an end-to-end run that "trained" an
    # untrained model)
    cpath = write_config(tmp_path, rng, batch_size=8, num_cases=2,
                         max_iterations=3)
    cfg = load_config(cpath)
    with pytest.raises(ValueError, match="no batches"):
        Trainer(cfg, log=False).train()


def test_scan_buffer_carries_across_epochs(tmp_path, rng):
    # ScanSteps=2 with 1 batch/epoch: the scan group fills across epochs;
    # a per-epoch buffer would silently drop every batch and never step
    cpath = write_config(tmp_path, rng, batch_size=2, num_cases=2,
                         max_iterations=4, ScanSteps=2, Epoches=8)
    cfg = load_config(cpath)
    assert cfg.train.scan_steps == 2
    state = Trainer(cfg, log=False).train()
    assert int(state.step) >= 2


def test_auc_and_scan_perf_streams(tmp_path, rng):
    """ComputeAUC wires the per-class AUC TB stream (model.py:608-626) and
    the ScanSteps path emits perf/* scalars too (round-1 gap: only the
    non-scan path logged throughput)."""
    # StepTimer has warmup=2: run >= 3 scan blocks so perf scalars emit
    cfg = load_config(write_config(tmp_path, rng, batch_size=2, num_cases=2,
                                   max_iterations=6, ScanSteps=2, Epoches=8,
                                   ComputeAUC=True))
    assert cfg.train.compute_auc

    class FakeWriter:
        def __init__(self):
            self.scalars = []

        def add_scalar(self, name, value, step):
            self.scalars.append(name)

        def add_image(self, *a, **k):
            pass

    writers = {}
    trainer = Trainer(cfg, log=True)
    trainer._writer = lambda tag: writers.setdefault(tag, FakeWriter())
    trainer.train()
    names = set(writers["train"].scalars)
    assert any(n.startswith("metrics/auc") for n in names), names
    assert "perf/step_time_s" in names
    assert "perf/patches_per_s" in names


def test_space_parallel_train_step_matches_dp(tmp_path, rng):
    """Mesh.SpaceParallel > 1 spatially partitions each patch (GSPMD conv
    halos). Semantics preserved: same inputs + same rng give the same loss
    and parameters as a data-parallel-only mesh."""
    # SGD: BN-shadowed biases have zero true gradient; Adam would amplify
    # the float noise into visible parameter differences
    sgd = {"Optimizer": {"Name": "SGD", "InitialLearningRate": 1e-2,
                         "Decay": {"Factor": 0.99, "Steps": 100}}}
    cfg_dp = load_config(write_config(tmp_path, rng, batch_size=2,
                                      patch=(32, 16, 16), **sgd))
    tr_dp = Trainer(cfg_dp, log=False)

    cfg_sp = load_config(write_config(
        tmp_path, rng, batch_size=2, patch=(32, 16, 16),
        **{"Mesh": {"DataParallel": 2, "SpaceParallel": 4}, **sgd}))
    tr_sp = Trainer(cfg_sp, log=False)
    assert dict(tr_sp.mesh.shape) == {"data": 2, "space": 4}

    s_dp = tr_dp.init_state()
    s_sp = tr_sp.init_state()
    images = rng.normal(size=tr_dp.batch_shape()).astype(np.float32)
    labels = (rng.random(tr_dp.batch_shape()[:-1]) > 0.7).astype(np.int32)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        s_dp, out_dp = tr_dp.train_step(s_dp, images, labels, key)
        s_sp, out_sp = tr_sp.train_step(s_sp, images, labels, key)
    np.testing.assert_allclose(float(out_dp.loss), float(out_sp.loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=1e-4, atol=1e-5),
        s_dp.params, s_sp.params)


def test_space_parallel_scan_steps_matches_dp(tmp_path, rng):
    """ScanSteps > 1 must keep Mesh.SpaceParallel active (the super-batch
    sharding includes the space axis) and reproduce the DP-only results."""
    sgd = {"Optimizer": {"Name": "SGD", "InitialLearningRate": 1e-2,
                         "Decay": {"Factor": 0.99, "Steps": 100}},
           "ScanSteps": 2}
    cfg_dp = load_config(write_config(tmp_path, rng, batch_size=2,
                                      patch=(32, 16, 16), **sgd))
    tr_dp = Trainer(cfg_dp, log=False)
    cfg_sp = load_config(write_config(
        tmp_path, rng, batch_size=2, patch=(32, 16, 16),
        **{"Mesh": {"DataParallel": 2, "SpaceParallel": 2}, **sgd}))
    tr_sp = Trainer(cfg_sp, log=False)

    s_dp = tr_dp.init_state()
    s_sp = tr_sp.init_state()
    images = rng.normal(size=(2, *tr_dp.batch_shape())).astype(np.float32)
    labels = (rng.random((2, *tr_dp.batch_shape()[:-1])) > 0.7).astype(
        np.int32)
    key = jax.random.PRNGKey(0)
    s_dp, outs_dp = tr_dp.train_steps_scanned(s_dp, images, labels, key)
    s_sp, outs_sp = tr_sp.train_steps_scanned(s_sp, images, labels, key)
    for a, b in zip(outs_dp, outs_sp):
        np.testing.assert_allclose(float(a.loss), float(b.loss), rtol=1e-5)
