"""CLI bounding-box renderer — counterpart of
`/root/reference/utils/bounding_box/main.py`: extract per-slice boxes from
a label map and render overlays.

    python scripts/bbox.py --image case/image.nii --label case/label.nii \
        --classes 1 2 --out_dir ./bbox_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--label", required=True)
    p.add_argument("--classes", nargs="*", type=int, default=[1])
    p.add_argument("--classnames_json", default="",
                   help="JSON mapping class id -> display name")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--out_dir", default="./bbox_out")
    args = p.parse_args()

    from vnet_tpu.io import read_image
    from vnet_tpu.utils import render_slice, volume_boxes

    image = read_image(args.image)
    label = read_image(args.label)
    classnames = {}
    if args.classnames_json:
        with open(args.classnames_json) as f:
            classnames = {int(k): v for k, v in json.load(f).items()}

    boxes_by_z = volume_boxes(label, args.classes, args.iou)
    os.makedirs(args.out_dir, exist_ok=True)
    for z, boxes in sorted(boxes_by_z.items()):
        render_slice(image.data[:, :, z], boxes, classnames,
                     os.path.join(args.out_dir, f"slice_{z:04d}.png"))
    print(f"rendered {len(boxes_by_z)} slices to {args.out_dir}")


if __name__ == "__main__":
    main()
