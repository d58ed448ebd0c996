"""Probe 2: same batch, train-mode forward vs eval_apply — argmax dice and
weighted-sorensen loss for each. Distinguishes 'model never learned'
(both bad, loss ~0.2 anyway => loss/dice divergence) from 'train/eval
forward mismatch' (train-mode good, eval bad)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vnet_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env("cpu")

import jax
import numpy as np

from vnet_tpu.config import load_config, load_pipeline
from vnet_tpu.data import build_pipeline
from vnet_tpu.data.dataset2d import NiftiDataset2D
from vnet_tpu.infer import Evaluator
from vnet_tpu.models import eval_apply
from vnet_tpu.ops.losses import segmentation_loss
from vnet_tpu.utils.synthdata import dice_per_class

cfg = load_config("tmp/quality2d/config.json")
ev = Evaluator(cfg)
net, variables = ev.network, ev.variables

pipeline_cfg = load_pipeline(cfg.train.pipeline_path)
tfms = build_pipeline(pipeline_cfg, "train", 2)
ds = NiftiDataset2D(
    cfg.train.data_dir, cfg.train.image_filenames, cfg.train.label_filename,
    transforms3D=tfms["3D"], transforms2D=tfms["2D"], train=True,
    labels=cfg.train.segmentation_classes, min_pixel=cfg.train.min_pixel,
    drop_ratio=cfg.train.drop_ratio, cache_cases=8)

imgs, lbls = [], []
for i in range(32):
    im, lb = ds.get_sample(i)
    imgs.append(im)
    lbls.append(lb)
x = np.stack(imgs)
y = np.stack(lbls)

def loss_fn(logits, labels):
    loss, _ = segmentation_loss(
        logits, labels, name=cfg.train.loss.name,
        num_classes=cfg.train.num_classes, weights=cfg.train.loss.weights)
    return loss

def report(tag, logits):
    logits = np.asarray(logits, np.float32)
    pred = np.argmax(logits, axis=-1)
    d = dice_per_class(pred, y, 3)
    lv = float(loss_fn(logits, y))
    print(f"{tag}: argmax dice {[round(float(v),3) for v in d]} "
          f"loss {lv:.4f}", flush=True)

# eval-mode forward
report("eval_apply (train=False)", eval_apply(net, variables, x))

# train-mode forward: mutable batch_stats + dropout rng
out, _ = net.apply(variables, x, train=True,
                   mutable=["batch_stats"],
                   rngs={"dropout": jax.random.PRNGKey(0)})
report("train-mode (train=True) ", out)
