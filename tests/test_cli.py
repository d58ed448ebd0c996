"""CLI-level smoke tests: main.py / train.py / evaluate.py argument
surfaces (reference main.py:13-58, train.py:20-71, evaluate.py:20-41)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_main_parser():
    import main as main_mod
    p = main_mod.get_parser()
    args = p.parse_args(["-p", "train", "--config_json", "x.json",
                         "--gpu", "0,1"])
    assert args.phase == "train"
    assert args.config_json == "x.json"
    with pytest.raises(SystemExit):
        p.parse_args(["-p", "bogus"])


def test_legacy_train_flags_to_config(tmp_path):
    import train as train_mod
    p = train_mod.get_parser()
    args = p.parse_args([
        "--data_dir", str(tmp_path), "--batch_size", "2",
        "--patch_size", "32", "--patch_layer", "16",
        "--loss_function", "jaccard", "--optimizer", "nesterov_momentum",
        "--momentum", "0.8", "--attention",
        "--log_dir", str(tmp_path / "log"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    cfg = train_mod.flags_to_config(args)
    assert cfg.train.patch_shape == (32, 32, 16)
    assert cfg.train.loss.name == "jaccard"
    assert cfg.train.optimizer.name == "NesterovMomentum"
    assert cfg.train.optimizer.momentum == 0.8
    assert cfg.train.network.attention
    # auto-generated pipeline exists and parses
    from vnet_tpu.config import load_pipeline
    from vnet_tpu.data import build_pipeline
    pipe = load_pipeline(cfg.train.pipeline_path)
    tfms = build_pipeline(pipe, "train", 3)
    assert [t.name for t in tfms] == ["Padding", "Random Crop"]
    # regression: the auto pipeline must NOT live under log_dir — the
    # Restore=False wipe (reference model.py:678-687) would delete it
    # before the loader reads it
    import os
    assert not os.path.abspath(cfg.train.pipeline_path).startswith(
        os.path.abspath(str(tmp_path / "log")))
    assert os.path.exists(cfg.train.pipeline_path)


def test_legacy_train_save_interval(tmp_path):
    """--save_interval reaches CheckpointEveryNEpochs (it was parsed but
    unwired: every 8-step epoch saved a ~100MB orbax checkpoint through
    the MB/s tunnel, turning ~5s of compute into 15-75s epochs)."""
    import train as train_mod
    p = train_mod.get_parser()
    args = p.parse_args(["--data_dir", str(tmp_path),
                         "--save_interval", "50"])
    cfg = train_mod.flags_to_config(args)
    assert cfg.train.ckpt_every_n_epochs == 50
    args = p.parse_args(["--data_dir", str(tmp_path)])
    cfg = train_mod.flags_to_config(args)
    assert cfg.train.ckpt_every_n_epochs == 1  # reference per-epoch default


def test_legacy_train_topology_flag(tmp_path):
    import train as train_mod
    p = train_mod.get_parser()
    args = p.parse_args(["--data_dir", str(tmp_path), "--legacy_topology"])
    cfg = train_mod.flags_to_config(args)
    assert cfg.train.network.name == "VNetLegacy"


def test_legacy_train_memory_flags(tmp_path):
    """--dropout_impl / --remat reach Networks (HBM levers for the deep
    attention graph: b8 64^3 with xla dropout OOMs a 16G v5e by ~268MB)."""
    import train as train_mod
    p = train_mod.get_parser()
    args = p.parse_args(["--data_dir", str(tmp_path), "--attention",
                         "--dropout_impl", "bits8", "--remat"])
    cfg = train_mod.flags_to_config(args)
    assert cfg.train.network.dropout_impl == "bits8"
    assert cfg.train.network.remat
    # defaults unchanged
    args = p.parse_args(["--data_dir", str(tmp_path)])
    cfg = train_mod.flags_to_config(args)
    assert cfg.train.network.dropout_impl == "xla"
    assert not cfg.train.network.remat


def test_legacy_evaluate_parser():
    import evaluate as eval_mod
    p = eval_mod.get_parser()
    args = p.parse_args(["--stride_inplane", "96", "--stride_layer", "8",
                         "--attention", "--gaussian_blend"])
    assert args.stride_inplane == 96
    assert args.attention and args.gaussian_blend


def test_main_end_to_end_train(tmp_path, rng):
    """main.py -p train on a tiny config actually trains (in-process)."""
    import main as main_mod
    from test_trainer import write_config
    cpath = write_config(tmp_path, rng, max_iterations=1)
    args = main_mod.get_parser().parse_args(
        ["-p", "train", "--config_json", cpath])
    main_mod.main(args)
    assert os.path.isdir(str(tmp_path / "ckpt"))


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
