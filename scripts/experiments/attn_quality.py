"""Attention-gated V-Net quality run (the round-4 "4e" runbook, round 5).

The last reference *training path* with no on-TPU demonstration
(`/root/reference/train.py:281-310`): the legacy flag CLI with
``--attention`` — attention-gated V-Net + distance-map aux loss — whose
full production graph at b8 64^3 OOMed 16 GB HBM with xla dropout in
round 4 (BENCHMARKS.md "Other model families"). This drives it
end-to-end at the real CLI surfaces:

  1. hard-synthetic dataset (96^3, 64 train / 4 eval cases, 0.6 sigma),
     binary semantics per the legacy CLI (SegmentationClasses [0,1]:
     class-2 blobs remap to background = unlabeled dark distractors);
  2. ``train.py --attention --dropout_impl bits8 --device_augment`` with
     the quality3 recipe (statnorm + flip + crop drop 0.3/min_pixel 32 +
     noise), 6000 steps b8 64^3 — the bits8 HBM-fit hypothesis test;
  3. ``evaluate.py --attention`` twice: parity EMA eval (reference
     evaluate.py:249-251 feeds train_phase=False on this path) AND
     batch_stats eval (the round-4 BN finding: EMA eval collapses this
     deep net family — record both);
  4. per-case class-1 Dice table for BENCHMARKS.md.

Resumable: train.py restores from the orbax checkpoint by default, so a
retry after a tunnel drop continues rather than restarting.

    python scripts/experiments/attn_quality.py --workdir tmp/r5_attn
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def sh(args, **kw):
    print("+", " ".join(args), flush=True)
    return subprocess.run(args, check=True, cwd=REPO, **kw)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="tmp/r5_attn")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--dropout_impl", default="bits8")
    ap.add_argument("--remat", action="store_true",
                    help="HBM escape hatch if bits8 alone still OOMs")
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny CPU smoke (48^3 volumes, 32^3 patches, "
                         "4 cases) — verifies the full chain, not quality")
    args = ap.parse_args(argv)

    shape, n_train, n_eval = ((48, 48, 48), 4, 2) if args.small \
        else ((96, 96, 64), 64, 4)
    patch, batch = (32, 2) if args.small else (64, 8)

    wd = os.path.abspath(os.path.join(REPO, args.workdir))
    os.makedirs(wd, exist_ok=True)

    if not os.path.isdir(os.path.join(wd, "training")):
        import numpy as np
        from vnet_tpu.utils.synthdata import make_hard_dataset
        print(f"generating dataset under {wd} ...", flush=True)
        rng = np.random.default_rng(42)
        make_hard_dataset(wd, "training", n_train, rng, shape=shape)
        make_hard_dataset(wd, "testing", max(2, n_train // 8), rng,
                          shape=shape)
        make_hard_dataset(wd, "evaluate", n_eval, rng, shape=shape)

    ppath = os.path.join(wd, "pipeline.yaml")
    if not os.path.isfile(ppath):
        import yaml
        patch_l = [patch] * 3
        norm = {"name": "StatisticalNormalization", "variables": {"sigma": 2.5}}
        pad = {"name": "Padding", "variables": {"output_size": patch_l}}
        train3d = [norm, pad,
                   {"name": "RandomFlip",
                    "variables": {"axes": [True, True, True]}},
                   {"name": "RandomCrop",
                    "variables": {"output_size": patch_l, "drop_ratio": 0.3,
                                  "min_pixel": 32}},
                   {"name": "RandomNoise", "variables": {"sigma": 8}}]
        with open(ppath, "w") as f:
            yaml.safe_dump({"preprocess": {
                "train": {"3D": train3d},
                "test": {"3D": [norm, pad,
                                {"name": "RandomCrop",
                                 "variables": {"output_size": patch_l,
                                               "drop_ratio": 1.0,
                                               "min_pixel": 0}}]},
                "evaluate": {"3D": [norm, pad]},
            }}, f)

    ckpt = os.path.join(wd, "ckpt")

    def train_cmd(remat: bool):
        return [sys.executable, "train.py", "--attention",
                "--data_dir", wd, "--pipeline", ppath,
                "--batch_size", str(batch),
                "--patch_size", str(patch), "--patch_layer", str(patch),
                "--max_iterations", str(args.steps),
                "--optimizer", "adam", "--init_learning_rate", "1e-3",
                "--loss_function", "sorensen",
                "--attention_loss_function", "l2",
                "--drop_ratio", "0.3", "--min_pixel", "32",
                "--dropout_impl", args.dropout_impl,
                *(["--remat"] if remat else []),
                "--cache_cases", "64", "--device_augment",
                "--display_step", "50", "--save_interval", "20",
                "--log_dir", os.path.join(wd, "log"),
                "--checkpoint_dir", ckpt]

    try:
        sh(train_cmd(args.remat))
    except subprocess.CalledProcessError:
        if args.remat:
            raise
        # the documented fallback chain (BENCHMARKS.md round-4 attention
        # OOM record): if bits8 alone doesn't fit the 16 GB HBM, remat
        # trades the heads' live activations for recompute. Identical
        # math + pytree, so the orbax checkpoint (if any) resumes.
        print("train failed without remat; retrying with --remat "
              "(HBM-fit fallback)", flush=True)
        sh(train_cmd(True))
    if args.train_only:
        return 0

    # dual eval via --eval_norm: no sidecar mutation (a stage-timeout
    # SIGTERM mid-eval must never corrupt the checkpoint's
    # network_config.json — the retry would inherit the wrong Norm)
    modes = {"ema": "ema", "bstats": "batch_stats"}
    for tag, eval_norm in modes.items():
        sh([sys.executable, "evaluate.py", "--attention",
            "--data_dir", os.path.join(wd, "evaluate"),
            "--checkpoint_path", ckpt, "--pipeline", ppath,
            "--patch_size", str(patch), "--patch_layer", str(patch),
            "--stride_inplane", str(patch // 2),
            "--stride_layer", str(patch // 2),
            "--batch_size", "4", "--eval_norm", eval_norm,
            "--label_filename", f"pred_{tag}.nii.gz"])

    import numpy as np
    from vnet_tpu.io import read_image
    from vnet_tpu.utils.synthdata import dice_per_class
    ev_dir = os.path.join(wd, "evaluate")
    for tag in modes:
        print(f"--- attention quality, {tag} eval ---", flush=True)
        for case in sorted(os.listdir(ev_dir)):
            cdir = os.path.join(ev_dir, case)
            truth = np.asarray(read_image(
                os.path.join(cdir, "label.nii")).data)
            truth = (truth == 1).astype(np.int32)  # binary legacy semantics
            pred = np.asarray(read_image(
                os.path.join(cdir, f"pred_{tag}.nii.gz")).data)
            d = dice_per_class(pred, truth, 2)
            print(f"{case} [{tag}]: dice per class "
                  f"{[round(float(x), 3) for x in d]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
