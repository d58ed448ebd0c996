"""Synthetic NIfTI fixture data shared across tests: a 3-case layout
matching the reference's data directory structure (README.md:109-135 —
``data/{training,testing,evaluate}/case/image.nii + label.nii``)."""

import os

import numpy as np

from vnet_tpu.io import MedicalImage, write_image


def make_case(rng, shape=(24, 24, 16), spacing=(1.0, 1.0, 1.5),
              num_channels=1, sphere_center=None, sphere_radius=5,
              label_value=1):
    """A noisy volume with a bright sphere; label marks the sphere."""
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    center = sphere_center or [s // 2 for s in shape]
    dist2 = sum((g - c) ** 2 for g, c in zip(grids, center))
    sphere = dist2 < sphere_radius ** 2

    images = []
    for _ in range(num_channels):
        data = rng.normal(40.0, 5.0, size=shape).astype(np.float32)
        data[sphere] += 120.0
        images.append(MedicalImage(data, spacing))
    label = MedicalImage((sphere * label_value).astype(np.uint8), spacing)
    return images, label


def write_case_dir(root, case_name, images, label,
                   image_filenames=("image.nii",), label_filename="label.nii",
                   write_label=True):
    case_dir = os.path.join(root, case_name)
    os.makedirs(case_dir, exist_ok=True)
    for img, fname in zip(images, image_filenames):
        write_image(img, os.path.join(case_dir, fname))
    if write_label:
        write_image(label, os.path.join(case_dir, label_filename))
    return case_dir


def make_dataset_dir(root, split="training", num_cases=2, rng=None,
                     shape=(24, 24, 16), num_channels=1, label_value=1):
    rng = rng or np.random.default_rng(0)
    split_dir = os.path.join(root, split)
    os.makedirs(split_dir, exist_ok=True)
    names = []
    fnames = tuple(f"image{i}.nii" if i else "image.nii"
                   for i in range(num_channels))
    for i in range(num_cases):
        images, label = make_case(
            rng, shape=shape, num_channels=num_channels,
            sphere_center=[shape[0] // 2 + i, shape[1] // 2 - i, shape[2] // 2],
            label_value=label_value)
        write_case_dir(split_dir, f"case_{i}", images, label,
                       image_filenames=fnames,
                       write_label=(split != "evaluate"))
        names.append(f"case_{i}")
    return split_dir, names, fnames
