"""BatchNorm evaluation semantics (reference parity).

The reference segments with ``train_phase=True`` — batch statistics at
inference (`/root/reference/model.py:917`); the legacy attention evaluator
is the exception (`evaluate.py:249-251`, EMA). Round 4 found the flax-style
EMA eval path diverging catastrophically on a trained deep BN net
(BENCHMARKS.md "Quality"), so ``Norm`` now defaults to "batch_stats" and
every inference surface routes through ``models.eval_apply``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vnet_tpu.config import parse_config
from vnet_tpu.models import build_network, eval_apply

pytestmark = pytest.mark.quick

TINY = dict(num_classes=2, num_channels=4, num_levels=2,
            num_convolutions=(1, 1), bottom_convolutions=1,
            dropout_rate=0.0)


def _init(net, shape=(2, 16, 16, 16, 1)):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                    jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return variables, x


def test_config_default_norm_is_batch_stats():
    cfg = parse_config({
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": ".", "TestingDataDirectory": ".",
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1],
            "PatchShape": [16, 16, 16],
            "Networks": {"Name": "VNet"},
        }})
    assert cfg.train.network.norm == "batch_stats"


def test_config_eval_norm_knob():
    """EvaluationSetting.EvalNorm: 'network' default, 'ema' accepted,
    anything else rejected (round-5 2D finding: slice-stacked eval needs
    EMA statistics — BENCHMARKS.md round-5 2D diagnosis part 2)."""
    base = {
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": ".", "TestingDataDirectory": ".",
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1],
            "PatchShape": [16, 16, 16],
            "Networks": {"Name": "VNet"},
        }}
    assert parse_config(base).evaluate.eval_norm == "network"
    base["EvaluationSetting"] = {"EvalNorm": "ema"}
    assert parse_config(base).evaluate.eval_norm == "ema"
    base["EvaluationSetting"] = {"EvalNorm": "bogus"}
    with pytest.raises(Exception):
        parse_config(base)


def test_evaluator_ema_norm_builds_batch_kind(tmp_path):
    """EvalNorm 'ema' rebuilds the eval network with norm='batch' (flax
    running averages at train=False); 'network' keeps batch_stats. Same
    checkpoint variables serve both."""
    import dataclasses
    from vnet_tpu.infer import Evaluator
    from vnet_tpu.train.trainer import TrainState

    cfg = parse_config({
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": str(tmp_path),
                     "TestingDataDirectory": str(tmp_path),
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1],
            "PatchShape": [16, 16, 16],
            "Networks": {"Name": "VNet", "NumChannel": 4, "NumLevels": 2,
                         "NumConvolutions": [1, 1],
                         "BottomConvolutions": 1},
        },
        "EvaluationSetting": {
            "Data": {"EvaluateDataDirectory": str(tmp_path),
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "pred.nii.gz"},
            "Stride": [16, 16, 16],
        }})
    net = build_network("VNet", num_classes=2, num_channels=4, num_levels=2,
                        num_convolutions=(1, 1), bottom_convolutions=1,
                        dropout_rate=0.0)
    variables, _ = _init(net)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       epoch=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None)
    ev = Evaluator(cfg, state=state)
    assert ev.network.norm == "batch_stats"
    cfg_ema = dataclasses.replace(
        cfg, evaluate=dataclasses.replace(cfg.evaluate, eval_norm="ema"))
    ev2 = Evaluator(cfg_ema, state=state)
    assert ev2.network.norm == "batch"
    # both apply cleanly with the same variables
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    y1 = eval_apply(ev.network, ev.variables, x)
    y2 = eval_apply(ev2.network, ev2.variables, x)
    assert y1.shape == y2.shape


def test_eval_apply_batch_stats_runs_without_mutable_error():
    net = build_network("VNet", norm="batch_stats", **TINY)
    variables, x = _init(net)
    out = eval_apply(net, variables, x)
    assert out.shape == (2, 16, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
    # plain apply(train=False) must raise: flax forbids the (discarded)
    # EMA write when batch_stats is immutable — the bug this helper fixes
    with pytest.raises(Exception):
        net.apply(variables, x, train=False)


def test_eval_apply_batch_stats_uses_batch_statistics():
    """batch_stats eval == train-mode normalization (batch statistics),
    not the stored EMA."""
    net_bs = build_network("VNet", norm="batch_stats", **TINY)
    variables, x = _init(net_bs)
    out_bs = eval_apply(net_bs, variables, x)
    # same params through the EMA path: at init the EMA is (0, 1) while
    # the batch statistics are the input's own moments -> different output
    net_ema = build_network("VNet", norm="batch", **TINY)
    out_ema = eval_apply(net_ema, variables, x)
    assert not np.allclose(np.asarray(out_bs), np.asarray(out_ema))
    # and it matches the train-mode forward exactly (dropout_rate=0)
    out_train, _ = net_bs.apply(variables, x, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(out_bs), np.asarray(out_train),
                               rtol=1e-5, atol=1e-5)


def test_eval_apply_batch_kind_matches_plain_apply():
    net = build_network("VNet", norm="batch", **TINY)
    variables, x = _init(net)
    np.testing.assert_array_equal(
        np.asarray(eval_apply(net, variables, x)),
        np.asarray(net.apply(variables, x, train=False)))


def test_export_forward_batch_stats():
    from vnet_tpu.export import export_forward, load_exported
    net = build_network("VNet", norm="batch_stats", **TINY)
    variables, x = _init(net, shape=(1, 16, 16, 16, 1))
    blob = export_forward(net, variables, (1, 16, 16, 16, 1))
    probs = np.asarray(load_exported(blob)(np.asarray(x)))
    assert probs.shape == (1, 16, 16, 16, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_legacy_attention_evaluator_keeps_ema_norm(tmp_path):
    """The reference's ATTENTION evaluator feeds train_phase=False (EMA,
    evaluate.py:249-251) while the plain path feeds True (evaluate.py:255);
    the legacy CLI mirrors that split unless the sidecar pins Norm."""
    import json

    import evaluate as evaluate_mod

    def cfg_for(sidecar=None, extra_flags=()):
        ckpt = tmp_path / f"ckpt_{len(list(tmp_path.iterdir()))}"
        ckpt.mkdir()
        if sidecar is not None:
            (ckpt / "network_config.json").write_text(json.dumps(sidecar))
        args = evaluate_mod.get_parser().parse_args([
            "--data_dir", str(tmp_path), "--checkpoint_path", str(ckpt),
            *extra_flags])
        return evaluate_mod.flags_to_config(args)

    # plain VNet: reference batch-stat eval (the config default)
    assert cfg_for().train.network.norm == "batch_stats"
    # attention via flag: EMA exception
    assert cfg_for(extra_flags=("--attention",)).train.network.norm == "batch"
    # attention via sidecar: EMA exception
    cfg = cfg_for(sidecar={"Networks": {"Name": "VNet", "Attention": True}})
    assert cfg.train.network.norm == "batch"
    # sidecar pins Norm explicitly: respected over the exception
    cfg = cfg_for(sidecar={"Networks": {"Name": "VNet", "Attention": True,
                                        "Norm": "batch_stats"}})
    assert cfg.train.network.norm == "batch_stats"


def test_legacy_train_attention_records_ema_norm(tmp_path):
    """train.py --attention records Norm=batch in the config (and thus the
    checkpoint sidecar), so the legacy evaluator's EMA exception follows
    the checkpoint (evaluate.py:249-251); plain runs keep the batch-stat
    default."""
    import train as train_mod

    base = ["--data_dir", str(tmp_path), "--batch_size", "2",
            "--patch_size", "32", "--patch_layer", "16",
            "--log_dir", str(tmp_path / "log"),
            "--checkpoint_dir", str(tmp_path / "ckpt")]
    cfg = train_mod.flags_to_config(train_mod.get_parser().parse_args(base))
    assert cfg.train.network.norm == "batch_stats"
    cfg = train_mod.flags_to_config(
        train_mod.get_parser().parse_args(base + ["--attention"]))
    assert cfg.train.network.norm == "batch"
