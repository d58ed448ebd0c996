from . import transforms2d, transforms3d  # noqa: F401  (populate registry)
from .dataset2d import NiftiDataset2D
from .dataset3d import NiftiDataset3D, list_cases, remap_label
from .loader import BatchLoader
from .registry import (build_pipeline, build_transform, build_transform_list,
                       register_transform, transform_names)

__all__ = [
    "NiftiDataset2D", "NiftiDataset3D", "BatchLoader", "list_cases",
    "remap_label", "build_pipeline", "build_transform",
    "build_transform_list", "register_transform", "transform_names",
]
