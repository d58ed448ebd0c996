"""Input-pipeline sustained-rate benchmark: can the host feed the TPU?

Measures end-to-end BatchLoader throughput (NIfTI decode -> transform
chain -> random crop -> batch assembly) in patches/s, for comparison with
the training step rate in BENCHMARKS.md. The reference's loader was a
single-threaded ``tf.data.map(py_func, num_parallel_calls=1)``
(`/root/reference/pipeline/NiftiDataset3D.py:47-50`) — this benchmark is
the evidence the SURVEY §7 "Keeping TPUs fed" risk asks for.

Two pipeline variants:
  full   — the production-shaped chain (StatisticalNormalization ->
           Resample -> Padding -> RandomCrop -> RandomNoise,
           pipeline3D.yaml:4-21 analog)
  lean   — host does decode + normalize + crop only; flip/noise run fused
           on device (`vnet_tpu/data/device_aug.py`).
  cached — full chain with ``cache_cases``: decode + the deterministic
           prefix memoized per case (exact, tests/test_datasets.py); the
           recommended production configuration.

Usage:
    python scripts/benchmark_loader.py [--cases 8] [--size 192 192 96]
        [--patch 64] [--batch 8] [--workers N] [--backend process]
        [--batches 20] [--variant full|lean|both]

Writes one JSON line per variant:
    {"variant": ..., "patches_per_s": ..., "workers": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def make_cases(root: str, n_cases: int, size, rng) -> str:
    """Synthetic .nii.gz cases with a bright-blob label (gzip keeps the
    decode cost realistic)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vnet_tpu.io.nifti import MedicalImage, write_image

    data_dir = os.path.join(root, "training")
    for i in range(n_cases):
        case = os.path.join(data_dir, f"case_{i}")
        os.makedirs(case, exist_ok=True)
        img = rng.normal(60.0, 25.0, size=size).astype(np.float32)
        lbl = np.zeros(size, np.uint8)
        c = [rng.integers(s // 4, 3 * s // 4) for s in size]
        r = max(4, min(size) // 6)
        zz, yy, xx = np.ogrid[:size[0], :size[1], :size[2]]
        sphere = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                  + (xx - c[2]) ** 2) <= r * r
        lbl[sphere] = 1
        img[sphere] += 60.0
        write_image(MedicalImage(img, (0.75, 0.75, 0.75)),
                    os.path.join(case, "image.nii.gz"))
        write_image(MedicalImage(lbl, (0.75, 0.75, 0.75)),
                    os.path.join(case, "label.nii.gz"))
    return data_dir


def build_dataset(data_dir: str, patch, variant: str, cache_cases: int = 0):
    from vnet_tpu.data.dataset3d import NiftiDataset3D
    from vnet_tpu.data import transforms3d as T

    tfms = [
        T.StatisticalNormalization(2.5),
        T.Resample((0.75, 0.75, 0.75)),
        T.Padding([patch] * 3),
    ]
    if variant == "confidence":
        # the reference production pipeline's sampler, jitter scaled to
        # the patch size (pipeline/pipeline3D.yaml: ConfidenceCrop2
        # rand 32 p 0.8 at 128^3 -> rand 16 at the default 64^3)
        tfms.append(T.ConfidenceCrop2([patch] * 3, rand_range=patch // 4,
                                      probability=0.8))
    else:
        tfms.append(T.RandomCrop([patch] * 3, drop_ratio=0.1, min_pixel=10))
    if variant in ("full", "confidence"):
        tfms.append(T.RandomNoise())
    return NiftiDataset3D(
        data_dir, ["image.nii.gz"], "label.nii.gz", transforms=tfms,
        train=True, labels=[0, 1], cache_cases=cache_cases)


def run(variant: str, args, data_dir) -> dict:
    from vnet_tpu.data.loader import BatchLoader

    base = {"cached": "full", "confidence": "confidence"}.get(variant, variant)
    ds = build_dataset(data_dir, args.patch, base,
                       cache_cases=(args.cases
                                    if variant in ("cached", "confidence")
                                    else 0))
    loader = BatchLoader(ds, batch_size=args.batch, shuffle=True,
                         num_workers=args.workers, backend=args.backend,
                         prefetch=2 * args.batch, seed=0)
    # warm one batch (fork/exec + page-cache fill), then measure
    it = iter(loader.epoch())
    epochs = 0
    next(it)
    t0 = time.perf_counter()
    produced = 0
    while produced < args.batches:
        try:
            b = next(it)
        except StopIteration:
            epochs += 1
            it = iter(loader.epoch())
            continue
        produced += 1
    dt = time.perf_counter() - t0
    patches = produced * args.batch
    return {
        "variant": variant,
        "patches_per_s": round(patches / dt, 2),
        "sec_per_batch": round(dt / produced, 3),
        "workers": args.workers,
        "backend": args.backend,
        "batch": args.batch,
        "patch": args.patch,
        "cases": args.cases,
        "case_size": list(args.size),
        "host_cpus": os.cpu_count(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=3, default=[192, 192, 96])
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 2)
    ap.add_argument("--backend", default="process",
                    choices=["thread", "process"])
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--variant", default="both",
                    choices=["full", "lean", "cached", "confidence", "both"])
    ap.add_argument("--data_dir", default="",
                    help="reuse an existing case dir instead of generating")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.data_dir:
        data_dir = args.data_dir
    else:
        tmp = tempfile.mkdtemp(prefix="loaderbench_")
        data_dir = make_cases(tmp, args.cases, tuple(args.size), rng)

    variants = (["full", "lean", "cached", "confidence"]
                if args.variant == "both"
                else [args.variant])
    for v in variants:
        print(json.dumps(run(v, args, data_dir)), flush=True)


if __name__ == "__main__":
    main()
