"""Runnable end-to-end quickstart: synthetic dataset -> train -> evaluate.

Generates a small hard-synthetic 3-class dataset (irregular blobs, <=1%
foreground, heavy intensity overlap — `vnet_tpu/utils/synthdata.py`),
writes a config + pipeline for it, runs the production `Trainer.train()`
loop (checkpoints, logs), then the full `Evaluator` (sliding window,
header restore) and prints per-class Dice on the held-out cases.

Mirrors the reference's README tutorial flow (`/root/reference/README.md`
"Usage": folder layout -> config.json -> main.py train/evaluate) with a
self-contained dataset so it runs anywhere:

    python scripts/quickstart.py --workdir /tmp/vnet_quickstart \
        --steps 60 --devices cpu           # small CPU demo (~10 min)
    python scripts/quickstart.py --steps 600    # real TPU, flagship-ish

The generated `<workdir>/config.json` is a normal framework config — the
same run can be reproduced with
`python main.py -p train --config_json <workdir>/config.json`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(workdir: str, shape, n_train: int, n_eval: int,
                  multimodal: bool = False, contrast: float = 0.6,
                  seed: int = 42):
    import numpy as np

    from vnet_tpu.utils.synthdata import make_hard_dataset

    rng = np.random.default_rng(seed)
    kw = dict(shape=shape, multimodal=multimodal, contrast=contrast)
    make_hard_dataset(workdir, "training", n_train, rng, **kw)
    make_hard_dataset(workdir, "testing", max(1, n_train // 8), rng, **kw)
    make_hard_dataset(workdir, "evaluate", n_eval, rng, **kw)


def write_config(workdir: str, patch, steps: int, small: bool,
                 drop_ratio: float = 0.2, min_pixel: int = 8,
                 lr: float = 1e-3, augment: bool = False,
                 multimodal: bool = False, seed: int = 42) -> str:
    import yaml

    rank2 = len(patch) == 2
    if rank2:
        # 2D regime (reference NiftiDataset2D): the labeled-SLICE
        # inventory does the rare-class balancing (TrainingSetting
        # DropRatio/MinPixel below), so the 2D RandomCrop can keep mild
        # settings. The hard synthetic's intensities are N(100, 20)
        # x (1 +- 10% bias); window 40..160 = +-3 sigma
        # (no 2D StatisticalNormalization in the reference's registry).
        train_tfms2d = [
            {"name": "ManualNormalization",
             "variables": {"windowMin": 40, "windowMax": 160}},
            {"name": "Padding", "variables": {"output_size": list(patch)}},
        ]
        if augment:
            # the reference's 2D training arsenal
            # (NiftiDataset2D.py:534-624): parameterless RandomFlip
            # (independent LR/UD, each p=0.5) + RandomRotate
            # (uniform [-90,90) deg) + RandomTranslate
            train_tfms2d.append({"name": "RandomFlip"})
            train_tfms2d.append({"name": "RandomRotate"})
            train_tfms2d.append({"name": "RandomTranslate",
                                 "variables": {"maxOffset": [10, 10]}})
        train_tfms2d.append(
            {"name": "RandomCrop",
             "variables": {"output_size": list(patch),
                           "drop_ratio": drop_ratio,
                           "min_pixel": min_pixel}})
        eval_tfms2d = [
            {"name": "ManualNormalization",
             "variables": {"windowMin": 40, "windowMax": 160}},
            {"name": "Padding", "variables": {"output_size": list(patch)}},
        ]
        pipeline = {"preprocess": {
            "train": {"3D": [], "2D": train_tfms2d},
            "test": {"3D": [], "2D": eval_tfms2d + [
                {"name": "RandomCrop",
                 "variables": {"output_size": list(patch), "drop_ratio": 1.0,
                               "min_pixel": 0}}]},
            "evaluate": {"3D": [], "2D": eval_tfms2d},
        }}
    else:
        # augment=True adds the reference's standard training augmentations
        # (RandomFlip + RandomNoise, cf. pipeline/pipeline3D.yaml): the
        # quality2 diagnosis (BENCHMARKS.md "Quality") found an un-augmented
        # net brittle — individual grid patches collapse to noise predictions
        # while neighboring patches in the SAME batch segment at dice ~0.9.
        # Noise sigma 8 ~= 0.16 of the post-StatisticalNormalization noise
        # std (window maps mean+/-2.5 std -> 0..255, so 1 sigma ~= 51).
        train_tfms = [
            {"name": "StatisticalNormalization", "variables": {"sigma": 2.5}},
            {"name": "Padding", "variables": {"output_size": list(patch)}},
        ]
        if augment:
            train_tfms.append(
                {"name": "RandomFlip",
                 "variables": {"axes": [True, True, True]}})
        train_tfms.append(
            # drop_ratio = probability of ACCEPTING a crop with fewer than
            # min_pixel foreground voxels (reference NiftiDataset3D.py
            # RandomCrop semantics); at <=1% foreground, LOWERING it (with
            # a meaningful min_pixel) biases sampling toward patches the
            # rare classes actually appear in
            {"name": "RandomCrop",
             "variables": {"output_size": list(patch),
                           "drop_ratio": drop_ratio,
                           "min_pixel": min_pixel}})
        if augment:
            # after the crop: noise on the 64^3 patch, not the whole volume
            train_tfms.append(
                {"name": "RandomNoise", "variables": {"sigma": 8}})
        pipeline = {"preprocess": {
            "train": {"3D": train_tfms},
            "test": {"3D": [
                {"name": "StatisticalNormalization",
                 "variables": {"sigma": 2.5}},
                {"name": "Padding", "variables": {"output_size": list(patch)}},
                {"name": "RandomCrop",
                 "variables": {"output_size": list(patch), "drop_ratio": 1.0,
                               "min_pixel": 0}},
            ]},
            "evaluate": {"3D": [
                {"name": "StatisticalNormalization",
                 "variables": {"sigma": 2.5}},
                {"name": "Padding", "variables": {"output_size": list(patch)}},
            ]},
        }}
    ppath = os.path.join(workdir, "pipeline.yaml")
    with open(ppath, "w") as f:
        yaml.safe_dump(pipeline, f)

    net = ({"Name": "VNet", "Dropout": 0.0, "NumChannel": 4, "NumLevels": 2,
            "NumConvolutions": [1, 1], "BottomConvolutions": 1}
           if small else
           {"Name": "VNet", "Dropout": 0.01, "NumChannel": 16,
            "NumLevels": 4, "NumConvolutions": [1, 2, 3, 3],
            "BottomConvolutions": 3, "PackedTargetLanes": 128})
    # 3D augmentation runs as the fused on-device tail (data/device_aug.py):
    # the trainer extracts RandomFlip/RandomNoise from the host chain
    # (trainer.py::_extract_device_augment, identical math — flip all axes
    # together p=0.5, additive gaussian on the cropped patch), leaving the
    # 1-core host only the cached statnorm prefix + RandomCrop. Round-4's
    # multimodal quality run starved at 8.6-16.4 s per 8-step epoch with the
    # host chain (BENCHMARKS.md).
    device_augment = bool(augment and not rank2)
    cfg = {
        "TrainingSetting": {
            "Seed": seed,
            "DeviceAugment": device_augment,
            "Data": {"TrainingDataDirectory": os.path.join(workdir, "training"),
                     "TestingDataDirectory": os.path.join(workdir, "testing"),
                     "ImageFilenames": (["image.nii", "image_t2.nii"]
                                        if multimodal else ["image.nii"]),
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1, 2],
            # rank-2: the slice inventory keeps slices whose smallest
            # per-class count exceeds MinPixel, else with prob DropRatio
            **({"DropRatio": drop_ratio, "MinPixel": min_pixel}
               if rank2 else {}),
            "BatchSize": (4 if small else 32) if rank2
            else (2 if small else 8),
            "PatchShape": list(patch),
            "Epoches": 10 ** 6,  # bounded by MaxIterations
            "MaxIterations": steps,
            "LogDir": os.path.join(workdir, "log"),
            "CheckpointDir": os.path.join(workdir, "ckpt"),
            "LogInterval": max(10, steps // 4),
            # epochs here are ~3 steps; per-epoch orbax saves through the
            # tunnel cost 3-20 s each and dominated the 600-step quality
            # run's wall-clock — thin them (final state still saved)
            "CheckpointEveryNEpochs": 20,
            "Precision": "float32" if small else "bfloat16",
            "CacheCases": 64,
            "Networks": net,
            "Loss": {"Name": "weighted_sorensen", "Weights": [0.01, 0.3, 1.0]},
            "Optimizer": {"Name": "Adam", "InitialLearningRate": lr,
                          "Decay": {"Factor": 0.99, "Steps": 100}},
            "Pipeline": ppath,
        },
        "EvaluationSetting": {
            "Data": {"EvaluateDataDirectory": os.path.join(workdir, "evaluate"),
                     "ImageFilenames": (["image.nii", "image_t2.nii"]
                                        if multimodal else ["image.nii"]),
                     "LabelFilename": "pred.nii.gz",
                     "ProbabilityOutput": False},
            "Stride": [max(8, p // 2) for p in patch],
            "BatchSize": 4,
            "Pipeline": ppath,
        },
    }
    cpath = os.path.join(workdir, "config.json")
    with open(cpath, "w") as f:
        json.dump(cfg, f, indent=2)
    return cpath


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", default="./tmp/quickstart")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--devices", default=None,
                    help="'cpu' forces the CPU backend (demo mode)")
    ap.add_argument("--small", action="store_true", default=None,
                    help="tiny network/patches (default when --devices cpu)")
    ap.add_argument("--drop-ratio", type=float, default=0.2,
                    help="RandomCrop probability of ACCEPTING a crop with "
                         "fewer than --min-pixel foreground voxels (lower "
                         "toward 0 to bias sampling onto the rare classes)")
    ap.add_argument("--min-pixel", type=int, default=8,
                    help="foreground-voxel threshold for --drop-ratio")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-train", type=int, default=None,
                    help="training cases to generate (default 8 small / "
                         "24 full)")
    ap.add_argument("--augment", action="store_true",
                    help="add RandomFlip + RandomNoise training "
                         "augmentation (reference pipeline3D.yaml style)")
    ap.add_argument("--rank2", action="store_true",
                    help="2D regime: train on labeled slices of the same "
                         "3D volumes (NiftiDataset2D parity), evaluate "
                         "slice-stacked, report 3D per-class Dice")
    ap.add_argument("--multimodal", action="store_true",
                    help="2-channel dataset (image.nii + image_t2.nii) "
                         "where each foreground class is separable in one "
                         "channel only — good Dice on both classes "
                         "requires modality fusion")
    ap.add_argument("--seed", type=int, default=42,
                    help="dataset-generation AND training seed (change "
                         "for reproducibility re-runs on fresh data)")
    ap.add_argument("--contrast", type=float, default=None,
                    help="lesion contrast in background-noise sigmas "
                         "(default 0.6; --rank2 defaults to 2.0 — the "
                         "per-slice matched-filter oracle proves 0.6 is "
                         "2D-unpassable, fg ceiling [0.38, 0.18], and "
                         "passes at 2.0 with ceiling ~[0.88, 0.86]: "
                         "scripts/experiments/diag2d/oracle2d_sweep.py, "
                         "BENCHMARKS.md round-5 2D diagnosis)")
    args = ap.parse_args(argv)

    from vnet_tpu.utils.platform import honor_jax_platforms_env
    if args.devices == "cpu":
        honor_jax_platforms_env("cpu")
    else:
        honor_jax_platforms_env()
    import jax
    small = args.small if args.small is not None else (args.devices == "cpu")

    import numpy as np

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    shape = (48, 48, 32) if small else (96, 96, 64)
    if args.rank2:
        patch = (48, 48) if small else (96, 96)  # whole-slice patches
    else:
        patch = (32, 32, 32) if small else (64, 64, 64)

    contrast = args.contrast if args.contrast is not None else (
        2.0 if args.rank2 else 0.6)
    meta_path = os.path.join(workdir, "dataset_meta.json")
    meta = {"contrast": contrast, "seed": args.seed, "shape": list(shape),
            "multimodal": bool(args.multimodal),
            "n_train": args.n_train or (8 if small else 24)}
    if not os.path.isdir(os.path.join(workdir, "training")):
        print(f"generating synthetic dataset under {workdir} "
              f"(contrast {contrast} sigma) ...", flush=True)
        build_dataset(workdir, shape, n_train=meta["n_train"],
                      n_eval=2 if small else 4,
                      multimodal=args.multimodal, contrast=contrast,
                      seed=args.seed)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
    elif os.path.isfile(meta_path):
        # dataset generation is skipped on reuse — the knobs that shape
        # the DATA (--contrast/--seed/--multimodal/--n-train) must match
        # what the existing workdir was generated with, or the run would
        # silently train on different data than the recipe claims
        with open(meta_path) as f:
            old = json.load(f)
        if old != meta:
            raise SystemExit(
                f"{workdir} holds a dataset generated with {old}, but "
                f"this invocation asks for {meta}; use a fresh --workdir "
                f"(or delete the old one) — generation is skipped on "
                f"reuse and the data would not match the recipe")
    else:
        import warnings
        warnings.warn(
            f"reusing pre-existing dataset in {workdir} with no "
            f"dataset_meta.json — cannot verify it matches "
            f"contrast={contrast}/seed={args.seed}", stacklevel=1)
    cpath = write_config(workdir, patch, args.steps, small,
                         drop_ratio=args.drop_ratio,
                         min_pixel=args.min_pixel, lr=args.lr,
                         augment=args.augment,
                         multimodal=args.multimodal, seed=args.seed)
    print(f"config written: {cpath}", flush=True)

    from vnet_tpu.config import load_config
    from vnet_tpu.infer import Evaluator
    from vnet_tpu.io import read_image
    from vnet_tpu.train import Trainer
    from vnet_tpu.utils.synthdata import dice_per_class

    cfg = load_config(cpath)
    print(f"devices: {jax.devices()}", flush=True)
    trainer = Trainer(cfg)
    state = trainer.train()
    print("training done", flush=True)

    def run_eval(cfg, tag=""):
        ev = Evaluator(cfg, state=state)
        results = ev.evaluate()
        print(f"evaluated {len(results)} case(s){tag}", flush=True)
        for pred_path in results:
            case_dir = os.path.dirname(pred_path)
            truth = np.asarray(
                read_image(os.path.join(case_dir, "label.nii")).data)
            pred = np.asarray(read_image(pred_path).data)
            d = dice_per_class(pred, truth, 3)
            print(f"{os.path.basename(case_dir)}{tag}: dice per class "
                  f"{[round(float(x), 3) for x in d]}", flush=True)

    if args.rank2:
        # dual eval: 2D slice-stacked eval is BN-composition-sensitive in
        # the OPPOSITE direction from 3D patch eval (batch-stats eval of
        # a mostly-empty volume stack collapses the fg classes while EMA
        # holds — BENCHMARKS.md round-5 2D diagnosis part 2); report both
        import dataclasses
        run_eval(cfg, tag=" [batch_stats]")
        cfg_ema = dataclasses.replace(
            cfg, evaluate=dataclasses.replace(cfg.evaluate, eval_norm="ema"))
        run_eval(cfg_ema, tag=" [ema]")
    else:
        run_eval(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
