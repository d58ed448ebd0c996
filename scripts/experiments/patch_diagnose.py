"""Per-patch eval diagnostic: break a case's sliding-window grid into its
individual patches and report hard per-class Dice + prediction histogram
for each, plus the blended result.

This is the probe that cracked the round-4 quality2 mystery: the blended
volume Dice was ~0.1 on foreground while 3 of the 4 grid patches scored
~0.9 — one patch collapsed to ~1/3-each-class noise *within the same
batch* (shared BatchNorm batch statistics), pinning the failure on model
robustness rather than the eval engine, whose blend reassembles the same
patches bit-consistently (BENCHMARKS.md "Quality").

    python scripts/experiments/patch_diagnose.py \
        --workdir tmp/quality2 --case training/case_0 [--devices cpu]

Reference context: the eval loop being diagnosed mirrors
`/root/reference/model.py:817-977` (patch grid + blend).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", required=True,
                    help="a quickstart-style workdir holding config.json")
    ap.add_argument("--case", required=True,
                    help="case dir relative to the workdir, e.g. "
                         "evaluate/case_0 (must contain label.nii)")
    ap.add_argument("--devices", default=None,
                    help="'cpu' forces the CPU backend")
    args = ap.parse_args(argv)

    from vnet_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env("cpu" if args.devices == "cpu" else None)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vnet_tpu.config import load_config
    from vnet_tpu.data import build_pipeline
    from vnet_tpu.config import load_pipeline
    from vnet_tpu.infer.evaluator import Evaluator
    from vnet_tpu.infer.sliding_window import build_patch_grid
    from vnet_tpu.io import read_image
    from vnet_tpu.models import eval_apply
    from vnet_tpu.utils.synthdata import dice_per_class

    workdir = os.path.abspath(args.workdir)
    cfg = load_config(os.path.join(workdir, "config.json"))
    ev = Evaluator(cfg)
    num_classes = ev.t.num_classes

    case_dir = os.path.join(workdir, args.case)
    sample = {"image": [read_image(os.path.join(case_dir, f))
                        for f in ev.e.image_filenames],
              "label": read_image(os.path.join(case_dir, "label.nii"))}
    pipeline_cfg = load_pipeline(ev.e.pipeline_path)
    for tfm in build_pipeline(pipeline_cfg, "evaluate", ev.t.dimension):
        sample = tfm(sample)
    vol = np.asarray(sample["image"][0].data, np.float32)
    truth = np.asarray(sample["label"].data)

    patch = tuple(ev.t.patch_shape)
    stride = tuple(ev.e.stride)
    grid = build_patch_grid(vol.shape, patch, stride)
    print(f"volume {vol.shape}, {len(grid)} patches "
          f"(patch {patch}, stride {stride})", flush=True)

    slices = [tuple(slice(int(s), int(s) + p) for s, p in zip(row, patch))
              for row in grid]
    batch = np.stack([vol[sl] for sl in slices])[..., None]
    logits = eval_apply(ev.network, ev.variables, jnp.asarray(batch))
    probs = np.asarray(jax.nn.softmax(
        np.asarray(logits, np.float32), axis=-1))

    acc = np.zeros(vol.shape + (num_classes,), np.float32)
    for i, sl in enumerate(slices):
        ppred = probs[i].argmax(-1)
        plab = truth[sl]
        d = [round(float(x), 3)
             for x in dice_per_class(ppred, plab, num_classes)]
        hist = np.bincount(ppred.ravel(), minlength=num_classes)
        print(f"patch {i:3d} start {tuple(int(s) for s in grid[i])} "
              f"dice {d} predhist {[int(h) for h in hist]}", flush=True)
        acc[sl] += probs[i]

    blended = acc.argmax(-1)
    d = [round(float(x), 3)
         for x in dice_per_class(blended, truth, num_classes)]
    print(f"blended (uniform) dice {d}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
