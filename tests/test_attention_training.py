"""Attention-gated training path: distance maps + auxiliary loss
(legacy reference train.py:281-310, 383-417)."""

import json
import os

import jax
import numpy as np
import pytest

from test_trainer import write_config
from vnet_tpu.config import load_config
from vnet_tpu.data.distance import distance_map
from vnet_tpu.train import Trainer


def test_distance_map_properties():
    lbl = np.zeros((12, 12, 12), np.int32)
    lbl[3:9, 3:9, 3:9] = 1
    dm = distance_map(lbl)
    assert dm.dtype == np.float32
    assert dm.max() == pytest.approx(1.0)
    assert dm[0, 0, 0] == 0.0
    # peak at core
    assert dm[6, 6, 6] > dm[3, 3, 3]
    # empty label -> zeros
    assert distance_map(np.zeros((4, 4, 4), np.int32)).sum() == 0


def test_attention_trainer_step(tmp_path, rng):
    cpath = write_config(tmp_path, rng, max_iterations=2)
    with open(cpath) as f:
        tree = json.load(f)
    tree["TrainingSetting"]["Networks"]["Attention"] = True
    tree["TrainingSetting"]["Networks"]["NumChannel"] = 4
    with open(cpath, "w") as f:
        json.dump(tree, f)

    cfg = load_config(cpath)
    assert cfg.train.network.attention
    trainer = Trainer(cfg, log=False)
    assert trainer.is_attention

    state = trainer.init_state()
    shape = trainer.batch_shape()
    images = rng.normal(size=shape).astype(np.float32)
    labels = (rng.random(shape[:-1]) > 0.7).astype(np.int32)
    dmaps = np.stack([distance_map(l) for l in labels])
    state, out = trainer.train_step(state, images, labels,
                                    jax.random.PRNGKey(0),
                                    distance_maps=dmaps)
    assert np.isfinite(out.loss)
    assert "attention_loss" in out.aux
    assert out.aux["total_loss"] == pytest.approx(out.loss, rel=1e-5)


def test_attention_full_loop(tmp_path, rng):
    """Dataset emits distance maps and the loop consumes 3-tuples."""
    cpath = write_config(tmp_path, rng, max_iterations=1)
    with open(cpath) as f:
        tree = json.load(f)
    tree["TrainingSetting"]["Networks"]["Attention"] = True
    tree["TrainingSetting"]["Networks"]["NumChannel"] = 4
    with open(cpath, "w") as f:
        json.dump(tree, f)
    cfg = load_config(cpath)
    state = Trainer(cfg, log=False).train()
    assert int(state.step) == 1


def test_attention_evaluator(tmp_path, rng):
    """Evaluation path with the attention-gated network (tuple output)."""
    from fixtures import make_dataset_dir
    from vnet_tpu.infer import Evaluator
    from vnet_tpu.io import read_image

    cpath = write_config(tmp_path, rng, max_iterations=1)
    with open(cpath) as f:
        tree = json.load(f)
    tree["TrainingSetting"]["Networks"]["Attention"] = True
    tree["TrainingSetting"]["Networks"]["NumChannel"] = 4
    with open(cpath, "w") as f:
        json.dump(tree, f)
    cfg = load_config(cpath)
    make_dataset_dir(str(tmp_path), "evaluate", num_cases=1, rng=rng)

    trainer = Trainer(cfg, log=False)
    state = trainer.train()
    ev = Evaluator(cfg, state=state)
    assert ev.is_attention
    results = ev.evaluate()
    assert len(results) == 1
    out = read_image(results[0])
    assert set(np.unique(out.data)) <= {0, 1}


def test_image_log_smoke(tmp_path, rng):
    """ImageLog=True writes TB image events without breaking the loop."""
    import glob
    cpath = write_config(tmp_path, rng, max_iterations=2, ImageLog=True,
                         LogInterval=1)
    cfg = load_config(cpath)
    state = Trainer(cfg, log=True).train()
    assert int(state.step) == 2
    events = glob.glob(os.path.join(cfg.train.log_dir, "train", "events*"))
    assert events
