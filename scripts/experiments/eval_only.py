"""Re-run ONLY the evaluation half of a quickstart workdir from its saved
checkpoint, with the blend implementation forced on the command line.

Exists to separate model quality from eval-path numerics: the round-4
quality2 run produced pathological held-out Dice (pred ~90-100% class 2)
with the new `BlendImpl: auto` -> pallas default, whose TPU numerics were
never validated (scripts/benchmark_eval.py measured speed only; the CPU
test suite exercises Pallas in interpret mode, not Mosaic). Running the
same checkpoint through both impls on the same hardware isolates the
variable.

    python scripts/experiments/eval_only.py --workdir tmp/quality2 \
        --blend-impl xla
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--blend-impl", default="xla",
                    choices=["xla", "pallas", "auto"])
    ap.add_argument("--devices", default=None,
                    help="'cpu' forces the CPU backend")
    ap.add_argument("--suffix", default=None,
                    help="write preds as pred_<suffix>.nii.gz instead of "
                         "overwriting pred.nii.gz")
    ap.add_argument("--data-dir", default=None,
                    help="evaluate a different case directory (e.g. the "
                         "TRAINING dir, to split overfitting from eval-path "
                         "bugs: train Dice high + held-out low = overfit)")
    ap.add_argument("--max-cases", type=int, default=None,
                    help="evaluate only the first N cases of --data-dir")
    args = ap.parse_args(argv)

    from vnet_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env("cpu" if args.devices == "cpu" else None)
    import numpy as np

    from vnet_tpu.config import load_config
    from vnet_tpu.infer import Evaluator
    from vnet_tpu.io import read_image
    from vnet_tpu.utils.synthdata import dice_per_class

    workdir = os.path.abspath(args.workdir)
    cfg = load_config(os.path.join(workdir, "config.json"))
    cfg.evaluate.blend_impl = args.blend_impl
    if args.suffix:
        base, ext = cfg.evaluate.label_filename.split(".nii")
        cfg.evaluate.label_filename = f"{base}_{args.suffix}.nii{ext}"
    if args.data_dir:
        cfg.evaluate.data_dir = os.path.abspath(args.data_dir)

    ev = Evaluator(cfg)
    results = ev.evaluate(max_cases=args.max_cases)
    print(f"blend_impl={args.blend_impl}: evaluated {len(results)} case(s)",
          flush=True)
    num_classes = ev.t.num_classes
    for pred_path in results:
        case_dir = os.path.dirname(pred_path)
        truth = np.asarray(
            read_image(os.path.join(case_dir, "label.nii")).data)
        pred = np.asarray(read_image(pred_path).data)
        d = dice_per_class(pred, truth, num_classes)
        print(f"{os.path.basename(case_dir)} [{args.blend_impl}]: dice "
              f"per class {[round(float(x), 3) for x in d]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
