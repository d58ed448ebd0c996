"""Round-5 2D diagnosis, part 2: the 2.0-sigma calibrated run STILL fails
held-out eval (fg Dice ~[0.12, 0.01]) while train loss reached 0.143
(weighted soft dice ~0.86, at the oracle ceiling). Localize the gap.

Probes on the surviving tmp/r5_q2d checkpoint (CPU backend):

  A: argmax Dice on train-pipeline inventory slices (the regime training
     saw — fg-rich crops, b32). Good here + bad on volumes = prior-shift/
     over-prediction on empty slices; bad here = the soft/argmax gap.
  B: per-class PREDICTED voxel fraction vs truth fraction on every slice
     of one evaluate-case volume (direct over-prediction measurement).
  C: full-volume Evaluator on the TRAINING cases (overfit vs transfer).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from vnet_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env("cpu")

import numpy as np

from vnet_tpu.config import load_config, load_pipeline
from vnet_tpu.data import build_pipeline
from vnet_tpu.data.dataset2d import NiftiDataset2D
from vnet_tpu.infer import Evaluator
from vnet_tpu.models import eval_apply
from vnet_tpu.utils.synthdata import dice_per_class

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else "tmp/r5_q2d"
cfg = load_config(os.path.join(WORKDIR, "config.json"))
ev = Evaluator(cfg)  # restores variables from the checkpoint
net, variables = ev.network, ev.variables

pipeline_cfg = load_pipeline(cfg.train.pipeline_path)
tfms = build_pipeline(pipeline_cfg, "train", 2)
ds = NiftiDataset2D(
    cfg.train.data_dir, cfg.train.image_filenames, cfg.train.label_filename,
    transforms3D=tfms["3D"], transforms2D=tfms["2D"], train=True,
    labels=cfg.train.segmentation_classes, min_pixel=cfg.train.min_pixel,
    drop_ratio=cfg.train.drop_ratio, cache_cases=8)


def predict(images, bs=32):
    preds = []
    for i in range(0, len(images), bs):
        logits = eval_apply(net, variables, np.stack(images[i:i + bs]))
        preds.append(np.argmax(np.asarray(logits, np.float32), axis=-1))
    return np.concatenate(preds)


# A: 64 inventory slices through the train pipeline
imgs, lbls = [], []
for i in range(64):
    im, lb = ds.get_sample(i)
    imgs.append(im)
    lbls.append(lb)
pred = predict(imgs)
truth = np.stack(lbls)
print("A train-pipeline slices b32 dice:",
      [round(float(d), 3) for d in dice_per_class(pred, truth, 3)],
      flush=True)
for c in (1, 2):
    print(f"A class {c}: pred frac {float((pred == c).mean()):.5f} "
          f"truth frac {float((truth == c).mean()):.5f}", flush=True)

# B: every z-slice of one evaluate case through the EVAL pipeline
from vnet_tpu.io import read_image
case_dir = sorted(os.listdir(cfg.eval.data_dir))[0]
img3d = np.asarray(read_image(os.path.join(
    cfg.eval.data_dir, case_dir, "image.nii")).data)
lab3d = np.asarray(read_image(os.path.join(
    cfg.eval.data_dir, case_dir, "label.nii")).data)
etfms = build_pipeline(pipeline_cfg, "evaluate", 2)["2D"]
slices, labels = [], []
for z in range(img3d.shape[2]):
    im, lb = img3d[:, :, z].astype(np.float32), lab3d[:, :, z]
    for t in etfms:
        im, lb = t(im, lb)
    slices.append(im)
    labels.append(lb)
pred = predict(slices)
truth = np.stack(labels)
print(f"B eval case {case_dir}: volume dice",
      [round(float(d), 3) for d in dice_per_class(pred, truth, 3)],
      flush=True)
for c in (1, 2):
    print(f"B class {c}: pred frac {float((pred == c).mean()):.5f} "
          f"truth frac {float((truth == c).mean()):.5f}", flush=True)
n_empty = sum(1 for lb in labels if (lb > 0).sum() == 0)
fp_on_empty = np.mean([float((p > 0).mean())
                       for p, lb in zip(pred, labels)
                       if (lb > 0).sum() == 0]) if n_empty else 0.0
print(f"B empty slices: {n_empty}/{len(labels)}, "
      f"mean predicted-fg fraction on them {fp_on_empty:.5f}", flush=True)

# C: full Evaluator on TRAINING cases
import dataclasses
cfg2 = dataclasses.replace(
    cfg, eval=dataclasses.replace(cfg.eval, data_dir=cfg.train.data_dir))
ev2 = Evaluator(cfg2)
results = ev2.evaluate()
for pred_path in results[:2]:
    cdir = os.path.dirname(pred_path)
    t = np.asarray(read_image(os.path.join(cdir, "label.nii")).data)
    p = np.asarray(read_image(pred_path).data)
    print(f"C train-case {os.path.basename(cdir)} dice:",
          [round(float(d), 3) for d in dice_per_class(p, t, 3)], flush=True)
