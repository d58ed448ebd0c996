"""CLI for the batch-evaluate grid search — counterpart of
`/root/reference/utils/batch_evaluate/main.py` (in-process, no shelling
out).

    python scripts/batch_evaluate.py --config_json configs/config.json \
        --ground_truth label.nii --stride_inplane 64 96 --stride_layer 32 \
        --modes DICE ITEM --csv out/grid.csv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_json", required=True)
    p.add_argument("--ground_truth", default="label.nii")
    p.add_argument("--checkpoints", nargs="*", default=None)
    p.add_argument("--stride_inplane", nargs="*", type=int, default=[64])
    p.add_argument("--stride_layer", nargs="*", type=int, default=[32])
    p.add_argument("--tolerance", type=float, default=3.0)
    p.add_argument("--modes", nargs="*", default=["DICE"],
                   choices=["DICE", "ITEM"])
    p.add_argument("--csv", default="batch_evaluate.csv")
    args = p.parse_args()

    from vnet_tpu.config import load_config
    from vnet_tpu.utils import BatchEvaluate

    config = load_config(args.config_json)
    be = BatchEvaluate(config, ground_truth_filename=args.ground_truth,
                       checkpoints=args.checkpoints,
                       stride_inplane_range=args.stride_inplane,
                       stride_layer_range=args.stride_layer,
                       tolerance=args.tolerance, modes=args.modes)
    results = be.run(csv_path=args.csv)
    best = BatchEvaluate.best(results, "DICE" if "DICE" in args.modes
                              else "sensitivity")
    print(f"best: ckpt={best.checkpoint} stride_inplane="
          f"{best.stride_inplane} stride_layer={best.stride_layer} "
          f"mean={best.mean('DICE'):.4f}")


if __name__ == "__main__":
    main()
