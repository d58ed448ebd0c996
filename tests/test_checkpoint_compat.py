"""Cross-implementation checkpoint compatibility: state trained with one
conv_impl loads and runs identically under another (the packed rewrites
keep parameter pytrees bit-identical)."""

import jax
import numpy as np
import pytest

from test_trainer import write_config
from vnet_tpu.config import load_config
from vnet_tpu.train import CheckpointManager, Trainer


def test_checkpoint_roundtrip_across_impls(tmp_path, rng):
    cpath = write_config(tmp_path, rng, max_iterations=1)
    cfg = load_config(cpath)
    trainer = Trainer(cfg, log=False)  # default packed
    state = trainer.train()

    from vnet_tpu.models import VNet

    x = rng.normal(size=trainer.batch_shape()).astype(np.float32)
    outs = {}
    for impl in ("direct", "s2d", "packed"):
        net = VNet(num_classes=2, num_channels=4, num_levels=2,
                   num_convolutions=(1, 1), bottom_convolutions=1,
                   dropout_rate=0.0, conv_impl=impl)
        outs[impl] = np.asarray(net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False))
    np.testing.assert_allclose(outs["direct"], outs["s2d"], atol=1e-4)
    np.testing.assert_allclose(outs["direct"], outs["packed"], atol=1e-4)

    # restore from disk into a fresh template and compare
    mgr = CheckpointManager(cfg.train.ckpt_dir)
    template = Trainer(cfg, log=False).init_state()
    restored = mgr.restore_latest(template)
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluation_restores_across_optimizers(tmp_path, rng):
    """Checkpoints trained with one optimizer evaluate under a config that
    names another: evaluation restores weights only (the reference's
    meta-graph restore never depended on optimizer state,
    model.py:1138-1139)."""
    import json

    cpath = write_config(tmp_path, rng, max_iterations=1,
                         Optimizer={"Name": "FusedAdam",
                                    "InitialLearningRate": 1e-3,
                                    "Decay": {"Factor": 0.99, "Steps": 100}})
    cfg = load_config(cpath)
    state = Trainer(cfg, log=False).train()
    # the Trainer leaves an architecture sidecar next to the checkpoints
    sidecar = json.load(open(str(tmp_path / "ckpt" / "network_config.json")))
    assert sidecar["Networks"]["NumChannel"] == 4
    assert sidecar["SegmentationClasses"] == [0, 1]

    # same architecture, different optimizer in the evaluation config
    tree = json.load(open(cpath))
    tree["TrainingSetting"]["Optimizer"]["Name"] = "Momentum"
    cpath2 = str(tmp_path / "config_eval.json")
    with open(cpath2, "w") as f:
        json.dump(tree, f)
    cfg2 = load_config(cpath2)

    from vnet_tpu.infer import Evaluator
    ev = Evaluator(cfg2)  # restores from CheckpointPath, weights only
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(ev.variables["params"])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
