from .batch_evaluate import (BatchEvaluate, GridResult, lesion_detection,
                             lesion_volume_buckets, overlap_measures)
from .bbox import Box, nms, render_slice, slice_boxes, volume_boxes

__all__ = [
    "BatchEvaluate", "GridResult", "lesion_detection",
    "lesion_volume_buckets", "overlap_measures",
    "Box", "nms", "render_slice", "slice_boxes", "volume_boxes",
]
