"""2D achievability oracle for the hard synthetic at 0.6 sigma contrast.

Per-slice matched-filter detector with every advantage a 2D model could
hope for: exact knowledge of the generative model (disk-shaped lesions,
+/-0.6 sigma shifts, smooth multiplicative bias), multi-scale matched
filters, and per-class decision thresholds tuned ON THE EVAL CASES to
maximize dice (oracle cheat). The resulting dice is an optimistic upper
bound for any per-slice (2D) segmenter; a trained 2D net scoring far
below it has a recipe problem, while an oracle score near zero means the
task is unpassable in 2D at this contrast.
"""
import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vnet_tpu.io import read_image
from vnet_tpu.utils.synthdata import dice_per_class

root = "tmp/quality2d/evaluate"
cases = sorted(os.listdir(root))

def slice_scores(sl):
    """Multi-scale matched-filter score map for one slice (positive =
    class-1 evidence, negative = class-2 evidence)."""
    # bias removal: the bias field is smooth (4x4x4 coarse grid over
    # 96x96x64 -> in-plane wavelength ~32px); divide by a heavy blur
    bias = ndimage.gaussian_filter(sl, 16.0)
    flat = sl / np.maximum(bias, 1e-6)
    flat = (flat - np.median(flat)) / (flat.std() + 1e-9)
    # matched filters at the lesion radii (2..5): normalized gaussian
    # means ~ disk averages; scale by sqrt(area) to unify noise units
    best = np.zeros_like(flat)
    for sigma in (1.0, 1.5, 2.0, 3.0):
        sm = ndimage.gaussian_filter(flat, sigma)
        # smoothing reduces noise std by ~1/(2*sqrt(pi)*sigma) in 2D
        snr = sm * (2.0 * np.sqrt(np.pi) * sigma)
        best = np.where(np.abs(snr) > np.abs(best), snr, best)
    return best

scores, truths = [], []
for case in cases:
    img = np.asarray(read_image(os.path.join(root, case, "image.nii")).data)
    lbl = np.asarray(read_image(os.path.join(root, case, "label.nii")).data)
    s = np.stack([slice_scores(img[:, :, z]) for z in range(img.shape[2])],
                 axis=2)
    scores.append(s)
    truths.append(lbl)

all_s = np.concatenate([s.ravel() for s in scores])
all_t = np.concatenate([t.ravel() for t in truths])

def best_threshold(sign):
    best = (0.0, None)
    for thr in np.arange(2.0, 8.0, 0.25):
        pred = (sign * all_s) > thr
        t = all_t == (1 if sign > 0 else 2)
        denom = pred.sum() + t.sum()
        d = 2.0 * (pred & t).sum() / max(denom, 1)
        if d > best[0]:
            best = (d, thr)
    return best

d1, t1 = best_threshold(+1)
d2, t2 = best_threshold(-1)
print(f"oracle pooled dice: class1 {d1:.3f} @thr {t1}, "
      f"class2 {d2:.3f} @thr {t2}", flush=True)
for case, s, t in zip(cases, scores, truths):
    pred = np.zeros(t.shape, np.uint8)
    pred[s > t1] = 1
    pred[-s > t2] = 2
    d = dice_per_class(pred, t, 3)
    print(f"{case}: oracle dice {[round(float(x), 3) for x in d]}",
          flush=True)
