"""Config system: the reference's JSON schema, validated into dataclasses.

Schema parity with ``TrainingSetting`` / ``EvaluationSetting`` as consumed
by `/root/reference/model.py:185-245` and documented in
`configs/config_sample.json`. Fixes the reference's known schema traps
(SURVEY.md §5.6): the ``NumCovolutions`` -> ``NumConvolutions`` typo gets a
back-compat alias, missing keys produce a clear error naming the JSON path
instead of a bare KeyError, and 2D/3D mode is still inferred from
``len(PatchShape)`` (`model.py:200`) but validated.

TPU-native additions (all optional, defaulted):
``Precision`` ("float32" | "bfloat16"), ``Norm`` ("batch_stats" |
"batch" | "group" | "instance"), ``Mesh`` (data-parallel axis size; 0 = all
devices), ``GaussianBlend`` for evaluation, ``Seed``. ``Norm`` defaults to
"batch_stats" — the reference's actual BatchNorm behavior (it feeds
``train_phase=True`` even at inference, `model.py:917`, so evaluation uses
the statistics of the eval batch). "batch" opts into flax-style EMA eval
instead; measured on the hard-synthetic quality benchmark, EMA eval
diverges catastrophically on this deep BN net (BENCHMARKS.md "Quality")
while batch-stat eval matches the reference.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import yaml


class ConfigError(ValueError):
    pass


_MISSING = object()


def _get(tree: dict, path: Sequence[str], default: Any = _MISSING):
    node = tree
    for i, key in enumerate(path):
        if not isinstance(node, dict) or key not in node:
            if default is not _MISSING:
                return default
            raise ConfigError(
                "Missing config key: " + ".".join(path[: i + 1]))
        node = node[key]
    return node


@dataclass
class NetworkConfig:
    name: str = "VNet"
    dropout: float = 0.01
    num_channel: int = 16
    num_levels: int = 4
    num_convolutions: tuple = (1, 2, 3, 3)
    bottom_convolutions: int = 3
    attention: bool = False
    # "batch_stats" = the reference's BN semantics (batch statistics in
    # every phase, model.py:917); see module docstring
    norm: str = "batch_stats"
    # adaptive per-level space-to-depth packing: pack each level with the
    # fewest axes reaching this many packed channels (128 = the MXU lane
    # width — the measured optimum, BENCHMARKS.md exp11). 0 = legacy full
    # packing. Exact rewrite either way; checkpoints interchange.
    packed_target_lanes: int = 128
    dropout_impl: str = "xla"  # "xla" | "bits8" | "pallas" (layers.Dropout)
    # rematerialize conv blocks (VNet) and the attention/output heads
    # (AttentionVNet): trades recompute for live-activation memory in
    # the backward pass; identical math and parameter pytree
    remat: bool = False
    # stride-1 block convs' weight-gradient formulation: "xla" (the
    # stock conv_backprop_filter), "custom" (explicit dot formulation,
    # ops/conv_vjp.py — measured layout-neutral), or "pallas" (VMEM
    # transposing hand kernel, ops/pallas/dw_conv.py). Exact rewrites —
    # checkpoints interchange
    dw_impl: str = "xla"


@dataclass
class LossConfig:
    name: str = "sorensen"
    weights: tuple = ()
    alpha: float = 1.0
    # attention-gate distance-map supervision (legacy train.py:383-401):
    # "l2" (x scale) or "abs"
    attention_kind: str = "l2"
    attention_scale: float = 100.0


@dataclass
class OptimizerConfig:
    name: str = "Adam"
    initial_learning_rate: float = 1e-2
    momentum: float = 0.9
    decay_factor: float = 0.99
    decay_steps: int = 100


@dataclass
class TrainingConfig:
    data_dir: str = ""
    test_data_dir: str = ""
    image_filenames: tuple = ("image.nii",)
    label_filename: str = "label.nii"
    batch_size: int = 1
    patch_shape: tuple = (64, 64, 64)
    segmentation_classes: tuple = (0, 1)
    restore: bool = True
    log_dir: str = "./tmp/log"
    ckpt_dir: str = "./tmp/ckpt"
    epochs: int = 999999999
    max_iterations: int = 15000
    log_interval: int = 50
    # checkpoint at every Nth epoch end (plus the LogInterval-step and
    # end-of-training saves, which are unaffected). Default 1 = the
    # reference's save-every-epoch semantics (model.py:806-808); raise it
    # when epochs are short and checkpoint I/O dominates wall-clock (e.g.
    # orbax saves through this environment's slow tunnel).
    ckpt_every_n_epochs: int = 1
    image_log: bool = False
    # per-class AUC TensorBoard stream (`/root/reference/model.py:608-626`);
    # off by default — the 200-threshold estimator is a measurable cost
    compute_auc: bool = False
    testing: bool = False
    test_step: int = 100
    network: NetworkConfig = field(default_factory=NetworkConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    spacing: tuple = ()
    drop_ratio: float = 0.01
    min_pixel: int = 30
    pipeline_path: str = ""
    # TPU-native extensions
    precision: str = "float32"
    mesh_data_parallel: int = 0  # 0 = all visible devices
    # >1: multi-slice deployment — the data axis spans DCN (slices) major
    # x ICI minor (parallel/mesh.py::make_multislice_mesh)
    mesh_dcn_parallel: int = 0
    # >1: spatially partition each patch's first spatial dim over this
    # many devices (GSPMD: XLA inserts conv halo collectives) — train on
    # patches larger than one chip's HBM; batch must divide data x 1
    mesh_space_parallel: int = 1
    seed: int = 0
    # >1: run this many optimizer steps inside one jitted lax.scan over a
    # stacked super-batch — amortizes per-call dispatch overhead
    scan_steps: int = 1
    # PRNG implementation for dropout keys: "rbg" is several times faster
    # than threefry on TPU for large dropout masks
    rng_impl: str = "rbg"
    # move RandomFlip/RandomNoise from the host transform chain into the
    # jitted train step (fused on-device augmentation)
    device_augment: bool = False
    # data-loader parallelism: worker count and backend ("thread" for
    # GIL-releasing numpy/scipy parsers, "process" for Python-bound
    # transform chains at production scale)
    loader_workers: int = 2
    loader_backend: str = "thread"
    # memoize decode + the deterministic transform prefix for this many
    # cases (exact; measured 5.2x loader throughput —
    # scripts/benchmark_loader.py). 0 = off.
    cache_cases: int = 0

    @property
    def dimension(self) -> int:
        return len(self.patch_shape)

    @property
    def input_channels(self) -> int:
        return len(self.image_filenames)

    @property
    def num_classes(self) -> int:
        return len(self.segmentation_classes)


@dataclass
class EvaluationConfig:
    data_dir: str = ""
    image_filenames: tuple = ("image.nii",)
    label_filename: str = "label_tf.nii.gz"
    probability_filename: str = "probability_tf.nii.gz"
    checkpoint_path: str = ""
    stride: tuple = (64, 64, 64)
    batch_size: int = 10
    probability_output: bool = False
    largest_connected_component: bool = False
    volume_threshold: float = 0.0
    pipeline_path: str = ""
    # TPU-native extension: cosine-window (Gaussian-like) patch blending
    gaussian_blend: bool = False
    # TPU-native extension: blend accumulation implementation — "auto"
    # picks "pallas" for unsharded 3D grids (measured 14% faster at dense
    # stride-32 on 512^3, BENCHMARKS.md "Whole-volume inference") and
    # "xla" otherwise; "xla" = dynamic_update_slice chains; "pallas" =
    # in-place DMA kernel (ops/pallas/fused.py::blend_accumulate_patches).
    # All impls are identical math (tests/test_sliding_window.py).
    blend_impl: str = "auto"
    # "argmax" (modern, model.py:934) or "average_hard" — the legacy
    # evaluator's hard-prediction averaging, rint(sum(pred)/visits + 0.01)
    # (`/root/reference/evaluate.py:264-271`)
    label_mode: str = "argmax"
    # legacy prob-map masking: zero the probability map where the
    # (volume-thresholded) label is nonzero — sitk MaskNegatedImageFilter
    # (`/root/reference/evaluate.py:316-323`); applied only when
    # volume_threshold > 0, matching the reference's guard
    mask_probability_with_label: bool = False
    # BN statistics source at inference: "network" = the network's own
    # norm kind (default "batch_stats" = the reference's
    # train_phase=True-at-inference semantics, model.py:917);
    # "ema" = the training-run running averages (flax use_running_average)
    # — measured ESSENTIAL for 2D slice-stacked eval, where the eval
    # batch (a whole volume, mostly empty slices) is far from the
    # fg-biased training batch composition and live batch statistics
    # collapse the foreground classes (BENCHMARKS.md round-5 2D
    # diagnosis part 2: class-2 Dice 0.003 batch-stats vs 0.704 ema on
    # the same checkpoint); "batch_stats" = force live batch statistics
    # even when the network was built with Norm "batch" (the legacy
    # attention sidecar records the reference's EMA exception — this
    # lets one checkpoint be evaluated both ways without editing the
    # sidecar). All modes share one checkpoint format.
    eval_norm: str = "network"


@dataclass
class Config:
    train: TrainingConfig
    evaluate: EvaluationConfig
    raw: dict = field(default_factory=dict)


def _network_config(tree: dict) -> NetworkConfig:
    net = _get(tree, ["TrainingSetting", "Networks"], {})
    # NumCovolutions typo back-compat (configs/config.json:29 vs model.py:216)
    num_conv = net.get("NumConvolutions", net.get("NumCovolutions", (1, 2, 3, 3)))
    if isinstance(num_conv, int):
        num_conv = (num_conv,)
    cfg = NetworkConfig(
        name=net.get("Name", "VNet"),
        dropout=float(net.get("Dropout", 0.01)),
        num_channel=int(net.get("NumChannel", 16)),
        num_levels=int(net.get("NumLevels", 4)),
        num_convolutions=tuple(num_conv),
        bottom_convolutions=int(net.get("BottomConvolutions", 3)),
        attention=bool(net.get("Attention", False)),
        norm=net.get("Norm", "batch_stats"),
        packed_target_lanes=int(net.get("PackedTargetLanes", 128)),
        dropout_impl=str(net.get("DropoutImpl", "xla")),
        remat=bool(net.get("Remat", False)),
        dw_impl=str(net.get(
            "DwImpl", "custom" if net.get("CustomDw", False) else "xla")),
    )
    if cfg.dw_impl not in ("xla", "custom", "pallas"):
        # SpatialConv's dispatch would silently fall through to "xla" on
        # a typo — a perf A/B must never measure the wrong configuration
        raise ConfigError("Networks.DwImpl must be 'xla', 'custom' or "
                          f"'pallas', got {cfg.dw_impl!r}")
    return cfg


def parse_config(tree: dict) -> Config:
    """Build a validated Config from the parsed JSON tree
    (key paths follow `model.py:185-245`)."""
    ts = _get(tree, ["TrainingSetting"], {})
    patch_shape = tuple(_get(tree, ["TrainingSetting", "PatchShape"], (64, 64, 64)))
    if len(patch_shape) not in (2, 3):
        raise ConfigError(
            "Invalid Patch Shape (length should be 2 or 3)")  # model.py:309

    loss_tree = ts.get("Loss", {})
    opt_tree = ts.get("Optimizer", {})
    decay = opt_tree.get("Decay", {})

    train = TrainingConfig(
        data_dir=_get(tree, ["TrainingSetting", "Data", "TrainingDataDirectory"], ""),
        test_data_dir=_get(tree, ["TrainingSetting", "Data", "TestingDataDirectory"], ""),
        image_filenames=tuple(_get(tree, ["TrainingSetting", "Data", "ImageFilenames"], ("image.nii",))),
        label_filename=_get(tree, ["TrainingSetting", "Data", "LabelFilename"], "label.nii"),
        batch_size=int(ts.get("BatchSize", 1)),
        patch_shape=patch_shape,
        segmentation_classes=tuple(ts.get("SegmentationClasses", (0, 1))),
        restore=bool(ts.get("Restore", True)),
        log_dir=ts.get("LogDir", "./tmp/log"),
        ckpt_dir=ts.get("CheckpointDir", "./tmp/ckpt"),
        epochs=int(ts.get("Epoches", 999999999)),
        max_iterations=int(ts.get("MaxIterations", 15000)),
        log_interval=int(ts.get("LogInterval", 50)),
        ckpt_every_n_epochs=int(ts.get("CheckpointEveryNEpochs", 1)),
        image_log=bool(ts.get("ImageLog", False)),
        compute_auc=bool(ts.get("ComputeAUC", False)),
        testing=bool(ts.get("Testing", False)),
        test_step=int(ts.get("TestStep", 100)),
        network=_network_config(tree),
        loss=LossConfig(
            name=loss_tree.get("Name", "sorensen"),
            weights=tuple(loss_tree.get("Weights", ()) or ()),
            alpha=float(loss_tree.get("Alpha", 1.0)),
            attention_kind=loss_tree.get("AttentionKind", "l2"),
            attention_scale=float(loss_tree.get("AttentionScale", 100.0)),
        ),
        optimizer=OptimizerConfig(
            name=opt_tree.get("Name", "Adam"),
            initial_learning_rate=float(opt_tree.get("InitialLearningRate", 1e-2)),
            momentum=float(opt_tree.get("Momentum", 0.9)),
            decay_factor=float(decay.get("Factor", 0.99)),
            decay_steps=int(decay.get("Steps", 100)),
        ),
        spacing=tuple(ts.get("Spacing", ()) or ()),
        drop_ratio=float(ts.get("DropRatio", 0.01)),
        min_pixel=int(ts.get("MinPixel", 30)),
        pipeline_path=ts.get("Pipeline", ""),
        precision=ts.get("Precision", "float32"),
        scan_steps=int(ts.get("ScanSteps", 1)),
        rng_impl=ts.get("RngImpl", "rbg"),
        device_augment=bool(ts.get("DeviceAugment", False)),
        loader_workers=int(ts.get("LoaderWorkers", 2)),
        loader_backend=ts.get("LoaderBackend", "thread"),
        cache_cases=int(ts.get("CacheCases", 0)),
        mesh_data_parallel=int(ts.get("Mesh", {}).get("DataParallel", 0)
                               if isinstance(ts.get("Mesh"), dict) else 0),
        mesh_dcn_parallel=int(ts.get("Mesh", {}).get("DcnDataParallel", 0)
                              if isinstance(ts.get("Mesh"), dict) else 0),
        mesh_space_parallel=int(ts.get("Mesh", {}).get("SpaceParallel", 1)
                                if isinstance(ts.get("Mesh"), dict) else 1),
        seed=int(ts.get("Seed", 0)),
    )

    es = tree.get("EvaluationSetting", {})
    evaluate = EvaluationConfig(
        data_dir=_get(tree, ["EvaluationSetting", "Data", "EvaluateDataDirectory"], ""),
        image_filenames=tuple(_get(tree, ["EvaluationSetting", "Data", "ImageFilenames"],
                                   train.image_filenames)),
        label_filename=_get(tree, ["EvaluationSetting", "Data", "LabelFilename"],
                            "label_tf.nii.gz"),
        probability_filename=_get(tree, ["EvaluationSetting", "Data", "ProbabilityFilename"],
                                  "probability_tf.nii.gz"),
        checkpoint_path=es.get("CheckpointPath", ""),
        stride=tuple(es.get("Stride", patch_shape)),
        batch_size=int(es.get("BatchSize", 10)),
        probability_output=bool(es.get("ProbabilityOutput", False)),
        largest_connected_component=bool(es.get("LargestConnectedComponent", False)),
        volume_threshold=float(es.get("VolumeThreshold", 0.0)),
        label_mode=str(es.get("LabelMode", "argmax")),
        mask_probability_with_label=bool(
            es.get("MaskProbabilityWithLabel", False)),
        pipeline_path=es.get("Pipeline", train.pipeline_path),
        gaussian_blend=bool(es.get("GaussianBlend", False)),
        blend_impl=str(es.get("BlendImpl", "auto")),
        eval_norm=str(es.get("EvalNorm", "network")),
    )

    if evaluate.eval_norm not in ("network", "ema", "batch_stats"):
        raise ConfigError("EvaluationSetting.EvalNorm must be "
                          "'network', 'ema' or 'batch_stats'")
    if len(evaluate.stride) != len(patch_shape):
        raise ConfigError("EvaluationSetting.Stride rank must match PatchShape")

    return Config(train=train, evaluate=evaluate, raw=tree)


def load_config(path: str) -> Config:
    with open(path) as f:
        tree = json.load(f)
    cfg = parse_config(tree)
    # resolve pipeline paths relative to the config file, like the reference
    # resolves them relative to CWD — relative-to-config is less surprising.
    base = os.path.dirname(os.path.abspath(path))
    for c, attr in ((cfg.train, "pipeline_path"), (cfg.evaluate, "pipeline_path")):
        p = getattr(c, attr)
        if p and not os.path.isabs(p) and not os.path.exists(p):
            cand = os.path.join(base, p)
            if os.path.exists(cand):
                setattr(c, attr, cand)
    return cfg


def load_pipeline(path: str) -> dict:
    """Parse a preprocessing pipeline YAML (`model.py:341-342`)."""
    with open(path) as f:
        return yaml.safe_load(f)
