"""Contrast calibration for the 2D-family quality task.

The round-5 diagnosis (BENCHMARKS.md "round-5 diagnosis") proved the
0.6-sigma hard synthetic is per-slice unpassable: a matched-filter
oracle with exact generative knowledge caps at pooled fg Dice
[0.38, 0.18]. This sweep runs the same oracle over candidate contrasts
on freshly generated cases to pick the contrast at which a 2D model can
legitimately pass — i.e. where the 2D quality run validates the 2D
dataset/trainer/evaluator stack instead of an information-theoretic
wall. Pure CPU (numpy/scipy).
"""
import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))))

from vnet_tpu.utils.synthdata import make_hard_case  # noqa: E402


def slice_scores(sl):
    """Multi-scale matched-filter score map (see oracle2d_r5.py)."""
    bias = ndimage.gaussian_filter(sl, 16.0)
    flat = sl / np.maximum(bias, 1e-6)
    flat = (flat - np.median(flat)) / (flat.std() + 1e-9)
    best = np.zeros_like(flat)
    for sigma in (1.0, 1.5, 2.0, 3.0):
        sm = ndimage.gaussian_filter(flat, sigma)
        snr = sm * (2.0 * np.sqrt(np.pi) * sigma)
        best = np.where(np.abs(snr) > np.abs(best), snr, best)
    return best


def oracle_dice(contrast, n_cases=4, seed=123):
    rng = np.random.default_rng(seed)
    scores, truths = [], []
    for _ in range(n_cases):
        img, lbl = make_hard_case(rng, contrast=contrast)
        vol = np.asarray(img.data)
        s = np.stack([slice_scores(vol[:, :, z])
                      for z in range(vol.shape[2])], axis=2)
        scores.append(s)
        truths.append(np.asarray(lbl.data))
    all_s = np.concatenate([s.ravel() for s in scores])
    all_t = np.concatenate([t.ravel() for t in truths])

    out = []
    for sign, cls in ((+1, 1), (-1, 2)):
        best = (0.0, None)
        for thr in np.arange(2.0, 10.0, 0.25):
            pred = (sign * all_s) > thr
            t = all_t == cls
            d = 2.0 * (pred & t).sum() / max(pred.sum() + t.sum(), 1)
            if d > best[0]:
                best = (float(d), float(thr))
        out.append(best)
    return out


if __name__ == "__main__":
    for contrast in (0.6, 1.0, 1.5, 2.0, 3.0):
        (d1, t1), (d2, t2) = oracle_dice(contrast)
        print(f"contrast {contrast:.1f}: oracle pooled dice "
              f"class1 {d1:.3f} @thr {t1}, class2 {d2:.3f} @thr {t2}",
              flush=True)
