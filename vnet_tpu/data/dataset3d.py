"""3D case dataset: NIfTI loading, header checks, label remapping,
transform chains — the equivalent of
`/root/reference/pipeline/NiftiDataset3D.py:10-165` without the tf.data /
py_func machinery: a plain iterable of numpy samples that the prefetching
loader (``vnet_tpu.data.loader``) parallelizes and batches.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.nifti import MedicalImage, read_image, zeros_like_geometry

IGNORED_ENTRIES = (".DS_Store", "@eaDir")  # NiftiDataset3D.py:40-45


def list_cases(data_dir: str) -> List[str]:
    cases = [c for c in sorted(os.listdir(data_dir))
             if c not in IGNORED_ENTRIES
             and os.path.isdir(os.path.join(data_dir, c))]
    return cases


def check_consistent_headers(images: Sequence[MedicalImage], path: str = ""):
    """Size/spacing/direction consistency across channels
    (`NiftiDataset3D.py:79-92`)."""
    ref = images[0]
    for img in images[1:]:
        same_size = img.GetSize() == ref.GetSize()
        same_spacing = np.allclose(img.spacing, ref.spacing, atol=1e-4)
        same_direction = np.allclose(img.direction, ref.direction, atol=1e-4)
        if not (same_size and same_spacing and same_direction):
            raise ValueError(
                f"Header info inconsistent: {path}\nSame size: {same_size}\n"
                f"Same spacing: {same_spacing}\nSame direction: {same_direction}")


def remap_label(label: MedicalImage, classes: Sequence[int]) -> MedicalImage:
    """Map raw label values to consecutive class indices: value
    ``classes[i]`` -> ``i`` (`NiftiDataset3D.py:119-137`); values not in
    ``classes`` become 0."""
    data = label.data
    out = np.zeros(data.shape, dtype=np.uint8)
    for i, value in enumerate(classes):
        out[data == value] = i
    return label.like(out)


class NiftiDataset3D:
    """Iterable over cases yielding ``(image[x,y,z,C] f32, label[x,y,z] i32)``.

    Mirrors the reference constructor signature
    (`NiftiDataset3D.py:22-37`); ``train=False`` creates an empty label of
    matching geometry (`NiftiDataset3D.py:94-97`).
    """

    def __init__(self, data_dir: str = "", image_filenames=("image.nii",),
                 label_filename: str = "label.nii", transforms=None,
                 train: bool = False, labels: Sequence[int] = (0, 1),
                 attention: bool = False):
        self.data_dir = data_dir
        self.image_filenames = list(image_filenames)
        self.label_filename = label_filename
        self.transforms = transforms or []
        self.train = train
        self.labels = list(labels)
        # attention=True additionally emits a distance-map supervision
        # target (legacy train.py:221-228 `distmap` feature, see
        # vnet_tpu.data.distance)
        self.attention = attention
        self.cases = list_cases(data_dir)

    def __len__(self):
        return len(self.cases)

    @property
    def data_size(self):
        return len(self.cases)

    def load_case(self, case: str):
        """Read + header-check + remap, no transforms. Returns the sample
        dict ``{'image': [MedicalImage], 'label': MedicalImage}``."""
        images = []
        for fname in self.image_filenames:
            path = os.path.join(self.data_dir, case, fname)
            try:
                images.append(read_image(path))
            except FileNotFoundError:
                raise
            except Exception as e:
                raise IOError(f"Error loading image: {path}: {e}") from e
        check_consistent_headers(images, os.path.join(self.data_dir, case))

        if self.train:
            lpath = os.path.join(self.data_dir, case, self.label_filename)
            try:
                label = read_image(lpath)
            except Exception as e:
                raise IOError(f"Error loading label: {lpath}: {e}") from e
            check_consistent_headers([images[0], label], lpath)
            label = remap_label(label, self.labels)
        else:
            label = zeros_like_geometry(images[0])
        return {"image": images, "label": label}

    def get_sample(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Parse one case through the transform chain
        (`NiftiDataset3D.py:62-165`)."""
        case = self.cases[index]
        sample = self.load_case(case)
        for transform in self.transforms:
            try:
                sample = transform(sample)
            except Exception as e:
                raise RuntimeError(
                    f"Dataset preprocessing error: {case} transform: "
                    f"{getattr(transform, 'name', transform)}: {e}") from e

        image_np = np.stack(
            [np.asarray(im.data, dtype=np.float32) for im in sample["image"]],
            axis=-1)
        label_np = np.asarray(sample["label"].data, dtype=np.int32)
        if self.attention:
            from .distance import distance_map
            return image_np, label_np, distance_map(label_np)
        return image_np, label_np

    def __iter__(self):
        for i in range(len(self.cases)):
            yield self.get_sample(i)
