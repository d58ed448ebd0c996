"""Bounding-box extraction + rendering from label maps.

Re-design of `/root/reference/utils/bounding_box/bbox.py`: per axial
slice, per class value, connected components become 2D boxes, overlapping
boxes are merged by non-maximum suppression (IoU 0.5, bbox.py:10-64), and
slices render with the image + boxes + class names via matplotlib.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import ndimage

from ..io import MedicalImage


@dataclass
class Box:
    x0: int
    y0: int
    x1: int
    y1: int
    label: int
    area: int

    def iou(self, other: "Box") -> float:
        ix0, iy0 = max(self.x0, other.x0), max(self.y0, other.y0)
        ix1, iy1 = min(self.x1, other.x1), min(self.y1, other.y1)
        iw, ih = max(ix1 - ix0, 0), max(iy1 - iy0, 0)
        inter = iw * ih
        union = ((self.x1 - self.x0) * (self.y1 - self.y0)
                 + (other.x1 - other.x0) * (other.y1 - other.y0) - inter)
        return inter / union if union else 0.0


def slice_boxes(label_slice: np.ndarray, class_value: int) -> List[Box]:
    cc, n = ndimage.label(label_slice == class_value)
    boxes = []
    for i, sl in enumerate(ndimage.find_objects(cc)):
        if sl is None:
            continue
        area = int((cc[sl] == (i + 1)).sum())
        boxes.append(Box(sl[0].start, sl[1].start, sl[0].stop, sl[1].stop,
                         class_value, area))
    return boxes


def nms(boxes: List[Box], iou_threshold: float = 0.5) -> List[Box]:
    """Greedy NMS by area (bbox.py:10-64)."""
    out: List[Box] = []
    for box in sorted(boxes, key=lambda b: -b.area):
        if all(box.iou(kept) <= iou_threshold for kept in out):
            out.append(box)
    return out


def volume_boxes(label: MedicalImage, classes: Sequence[int],
                 iou_threshold: float = 0.5) -> Dict[int, List[Box]]:
    """z -> NMS'd boxes over all non-background classes."""
    out = {}
    for z in range(label.GetSize()[2]):
        sl = label.data[:, :, z]
        boxes = []
        for cls in classes:
            if cls == 0:
                continue
            boxes.extend(slice_boxes(sl, cls))
        boxes = nms(boxes, iou_threshold)
        if boxes:
            out[z] = boxes
    return out


def render_slice(image_slice: np.ndarray, boxes: List[Box],
                 classnames: Optional[Dict[int, str]] = None,
                 output_path: Optional[str] = None):
    """Render one slice with boxes (bbox.py:147-237). Returns the figure
    unless ``output_path`` is given (then saves + closes)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    fig, ax = plt.subplots()
    ax.imshow(image_slice.T, cmap="gray", origin="lower")
    for b in boxes:
        ax.add_patch(Rectangle((b.x0, b.y0), b.x1 - b.x0, b.y1 - b.y0,
                               fill=False, edgecolor="red", linewidth=1))
        name = (classnames or {}).get(b.label, str(b.label))
        ax.text(b.x0, b.y1 + 1, name, color="red", fontsize=8)
    ax.axis("off")
    if output_path:
        fig.savefig(output_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return None
    return fig
