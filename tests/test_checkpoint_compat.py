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
