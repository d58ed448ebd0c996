"""Compare two prediction volumes per case (e.g. xla vs pallas blend).

    python scripts/experiments/compare_preds.py tmp/quality2/evaluate \
        pred_xla.nii.gz pred_pallas.nii.gz [tol]

Prints per-case agreement; exit 1 if any case disagrees on > tol
(default 1e-4 = 0.01% of voxels: argmax labels are integers — blend-impl
equivalence should be near-exact for a well-conditioned model, with
disagreement only at float ties). For a model that emits near-boundary
probabilities over large regions (e.g. the quality2 brittle checkpoint),
calibrate tol against the SAME-impl cross-backend disagreement first —
measured there: xla-vs-pallas on TPU 0.054% < TPU-vs-CPU same-impl
0.085%, i.e. the blend impls agree to within backend numerics
(BENCHMARKS.md "Quality").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv):
    root, name_a, name_b = argv[1], argv[2], argv[3]
    tol = float(argv[4]) if len(argv) > 4 else 1e-4
    import numpy as np

    from vnet_tpu.io import read_image

    worst = 0.0
    compared = 0
    for case in sorted(os.listdir(root)):
        pa = os.path.join(root, case, name_a)
        pb = os.path.join(root, case, name_b)
        if not (os.path.isfile(pa) and os.path.isfile(pb)):
            continue
        a = np.asarray(read_image(pa).data)
        b = np.asarray(read_image(pb).data)
        frac = float((a != b).mean())
        worst = max(worst, frac)
        compared += 1
        print(f"{case}: disagree {frac:.6%} of voxels", flush=True)
    if not compared:
        print(f"no cases with both {name_a} and {name_b} under {root}",
              flush=True)
        return 1
    print(f"worst case disagreement: {worst:.6%} (tol {tol:.6%})",
          flush=True)
    return 0 if worst <= tol else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
