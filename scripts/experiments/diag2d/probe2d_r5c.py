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
    os.path.dirname(os.path.abspath(__file__))))))

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

# A2: the same inventory slices through the EVAL-side 2D transforms
# (no rotation/flip/translate): if Dice jumps, the net is fine on raw
# noise and the train-side rotation is shifting the statistics; if it
# stays low, the net is just undertrained on class 2
tfms_eval = build_pipeline(pipeline_cfg, "evaluate", 2)
ds_raw = NiftiDataset2D(
    cfg.train.data_dir, cfg.train.image_filenames, cfg.train.label_filename,
    transforms3D=tfms_eval["3D"], transforms2D=tfms_eval["2D"], train=True,
    labels=cfg.train.segmentation_classes, min_pixel=cfg.train.min_pixel,
    drop_ratio=cfg.train.drop_ratio, cache_cases=8)
imgs2, lbls2 = [], []
for i in range(64):
    im, lb = ds_raw.get_sample(i)
    imgs2.append(im)
    lbls2.append(lb)
pred2 = predict(imgs2)
truth2 = np.stack(lbls2)
print("A2 unaugmented inventory slices b32 dice:",
      [round(float(d), 3) for d in dice_per_class(pred2, truth2, 3)],
      flush=True)
for c in (1, 2):
    print(f"A2 class {c}: pred frac {float((pred2 == c).mean()):.5f} "
          f"truth frac {float((truth2 == c).mean()):.5f}", flush=True)
# inventory composition: how many slices actually contain each class
n1 = sum(1 for lb in lbls2 if (lb == 1).sum() > 0)
n2 = sum(1 for lb in lbls2 if (lb == 2).sum() > 0)
px2 = sorted(int((lb == 2).sum()) for lb in lbls2)
print(f"A2 inventory: {n1}/64 slices contain class1, {n2}/64 class2; "
      f"class2 px quartiles {px2[16]}/{px2[32]}/{px2[48]}", flush=True)

# B: every z-slice of one evaluate case through the EVAL pipeline
from vnet_tpu.io import read_image
case_dir = sorted(os.listdir(cfg.evaluate.data_dir))[0]
img3d = np.asarray(read_image(os.path.join(
    cfg.evaluate.data_dir, case_dir, "image.nii")).data)
lab3d = np.asarray(read_image(os.path.join(
    cfg.evaluate.data_dir, case_dir, "label.nii")).data)
from vnet_tpu.data.transforms3d import _window
slices, labels = [], []
for z in range(img3d.shape[2]):
    # eval 2D chain = ManualNormalization(40,160) + no-op Padding at 96^2
    im = _window(img3d[:, :, z].astype(np.float32), 40, 160)[..., None]
    slices.append(im)
    labels.append(lab3d[:, :, z])
pred = predict(slices, bs=len(slices))  # one stacked dispatch = production
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

# D: the same eval volume under EMA statistics (norm="batch",
# train=False — checkpoints interchange by construction). The round-4
# parity fix moved 3D eval to batch_stats because EMA collapsed the
# deep net; 2D eval feeds a 64-slice mostly-EMPTY stack whose batch
# statistics differ from the fg-rich training batches — the shift may
# cut the other way here.
from vnet_tpu.models import build_network
net_cfg = cfg.train.network
ema_net = build_network(
    net_cfg.name, num_classes=len(cfg.train.segmentation_classes),
    num_channels=net_cfg.num_channel, num_levels=net_cfg.num_levels,
    num_convolutions=net_cfg.num_convolutions,
    bottom_convolutions=net_cfg.bottom_convolutions,
    dropout_rate=net_cfg.dropout, norm="batch",
    packed_target_lanes=net_cfg.packed_target_lanes)
pred_ema = []
for i in range(0, len(slices), 32):
    logits = ema_net.apply(variables, np.stack(slices[i:i + 32]),
                           train=False)
    pred_ema.append(np.argmax(np.asarray(logits, np.float32), axis=-1))
pred_ema = np.concatenate(pred_ema)
print(f"D eval case {case_dir} EMA-stats dice:",
      [round(float(d), 3) for d in dice_per_class(pred_ema, truth, 3)],
      flush=True)
for c in (1, 2):
    print(f"D class {c}: pred frac {float((pred_ema == c).mean()):.5f} "
          f"truth frac {float((truth == c).mean()):.5f}", flush=True)

# E: batch-stats eval of the SAME volume but batched like training
# (32-slice chunks shuffled with fg-rich inventory slices removed from
# isolation): chunk the volume into b32 instead of the one 64-slice
# stacked dispatch — batch-composition sensitivity at fixed content
pred_b32 = predict(slices, bs=32)
print(f"E eval case {case_dir} batch-stats b32 dice:",
      [round(float(d), 3) for d in dice_per_class(pred_b32, truth, 3)],
      flush=True)
