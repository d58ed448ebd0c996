"""Round-5 2D quality diagnosis: is the model good and the eval path broken,
or did training itself fail?

Feeds the round-4 2D checkpoint (tmp/quality2d/ckpt, train loss 0.208,
held-out AND train-set eval Dice ~[0.93, 0.05, 0.02]) with slices through
the TRAIN-side pipeline and measures per-class Dice of argmax predictions
under eval_apply, in three regimes:

  A: inventory slices, train batch size 32   (exactly what training saw)
  B: the same slices, eval batch size 4      (BN batch-size sensitivity)
  C: all 64 consecutive z-slices of one case, batch 4 (eval-path content:
     mostly empty slices -> BN stats contamination test)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vnet_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env("cpu")

import numpy as np

from vnet_tpu.config import load_config, load_pipeline
from vnet_tpu.data import build_pipeline
from vnet_tpu.data.dataset2d import NiftiDataset2D
from vnet_tpu.infer import Evaluator
from vnet_tpu.utils.synthdata import dice_per_class
from vnet_tpu.models import eval_apply

cfg = load_config("tmp/quality2d/config.json")
ev = Evaluator(cfg)  # restores variables from the checkpoint
net, variables = ev.network, ev.variables

pipeline_cfg = load_pipeline(cfg.train.pipeline_path)
tfms = build_pipeline(pipeline_cfg, "train", 2)
ds = NiftiDataset2D(
    cfg.train.data_dir, cfg.train.image_filenames, cfg.train.label_filename,
    transforms3D=tfms["3D"], transforms2D=tfms["2D"], train=True,
    labels=cfg.train.segmentation_classes, min_pixel=cfg.train.min_pixel,
    drop_ratio=cfg.train.drop_ratio, cache_cases=8)

def dice_of(images, labels, bs):
    preds = []
    for i in range(0, len(images), bs):
        logits = eval_apply(net, variables, np.stack(images[i:i + bs]))
        preds.append(np.argmax(np.asarray(logits, np.float32), axis=-1))
    pred = np.concatenate(preds)
    truth = np.stack(labels)
    return [round(float(d), 3) for d in dice_per_class(pred, truth, 3)]

# A/B: first 32 inventory slices (the slice list is pre-shuffled)
imgs, lbls = [], []
for i in range(32):
    im, lb = ds.get_sample(i)
    imgs.append(im)
    lbls.append(lb)
print("A  train-pipeline slices, b32:", dice_of(imgs, lbls, 32), flush=True)
print("B  same slices,          b4 :", dice_of(imgs, lbls, 4), flush=True)

# C: every z-slice of one training case, in order (eval-path content mix)
case = ds.slices[0][0]
idxs = [i for i, (c, _) in enumerate(ds.slices) if c == case]
print(f"C  case {case}: {len(idxs)} inventory slices of 64 total")
imgs_c, lbls_c = [], []
for i in idxs:
    im, lb = ds.get_sample(i)
    imgs_c.append(im)
    lbls_c.append(lb)
print("C1 one case's inventory slices, b4:", dice_of(imgs_c, lbls_c, 4),
      flush=True)
