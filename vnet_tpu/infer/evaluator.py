"""Whole-volume evaluation: transforms -> sliding window -> header restore.

Counterpart of ``image2label.evaluate`` and ``evaluate_single_{3D,2D}``
(`/root/reference/model.py:817-1243`): per case, read the image channels,
apply the evaluation transform chain, run the overlap-tiled sliding window
(on device, ``vnet_tpu.infer.sliding_window``), argmax the blended softmax,
rebuild geometry, resample the label (nearest) and optional per-class
probability maps (linear, softmax/weight) back onto the ORIGINAL image
grid, then largest-connected-component / volume-threshold post-processing
and NIfTI output (`model.py:1217-1243`).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_pipeline
from ..data import build_pipeline, list_cases
from ..data.dataset2d import extract_slice
from ..io import (MedicalImage, read_image, resample_like, write_image,
                  zeros_like_geometry)
from ..io.resample import LINEAR, NEAREST, pad_to_size
from ..models import build_network
from .postprocess import extract_largest_connected_component, volume_threshold
from .sliding_window import SlidingWindowInference


def _stack_channels(images: List[MedicalImage]) -> np.ndarray:
    return np.stack([np.asarray(im.data, np.float32) for im in images],
                    axis=-1)


class Evaluator:
    """Config-driven evaluation engine."""

    def __init__(self, config: Config, state=None, trainer=None):
        self.config = config
        self.t = config.train
        self.e = config.evaluate

        net_cfg = self.t.network
        name = "AttentionVNet" if net_cfg.attention else net_cfg.name
        self.is_attention = name == "AttentionVNet"
        dtype = jnp.bfloat16 if self.t.precision == "bfloat16" else jnp.float32
        # EvalNorm "ema": evaluate under the training-run running averages
        # instead of live batch statistics (same checkpoint; norm="batch"
        # at train=False IS flax's use_running_average path) — measured
        # essential for 2D slice-stacked eval; "batch_stats": force live
        # statistics on a net whose sidecar/config says "batch" (dual-
        # mode eval without mutating the checkpoint sidecar). See
        # config.EvaluationConfig.
        norm = net_cfg.norm
        if norm in ("batch", "batch_stats"):
            if self.e.eval_norm == "ema":
                norm = "batch"
            elif self.e.eval_norm == "batch_stats":
                norm = "batch_stats"
        self.network = build_network(
            name, num_classes=self.t.num_classes, dropout_rate=0.0,
            num_channels=net_cfg.num_channel, num_levels=net_cfg.num_levels,
            num_convolutions=net_cfg.num_convolutions,
            bottom_convolutions=net_cfg.bottom_convolutions,
            norm=norm,
            packed_target_lanes=net_cfg.packed_target_lanes,
            legacy_double_norm=(net_cfg.name == "VNetLegacy"),
            dw_impl=net_cfg.dw_impl, dtype=dtype)

        if state is not None:
            self.variables = {"params": state.params,
                              "batch_stats": state.batch_stats}
        else:
            self.variables = self._restore_variables()

        def apply_fn(variables, patches):
            # eval_apply: honors norm="batch_stats" (the reference segments
            # with train_phase=True, model.py:917 — batch statistics at
            # inference; EMA-based eval diverges catastrophically on deep
            # BN nets, see BENCHMARKS.md "Quality")
            from ..models import eval_apply
            out = eval_apply(self.network, variables, patches)
            return out[0] if self.is_attention else out

        # with >1 device, shard the patch grid over the mesh (each device
        # blends its sub-grid; one psum assembles the volume — SURVEY §5.7)
        mesh = None
        import jax
        if len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh
            mesh = make_mesh()
        if self.e.label_mode not in ("argmax", "average_hard"):
            raise ValueError(f"unknown LabelMode {self.e.label_mode!r}")
        self.hard_mode = self.e.label_mode == "average_hard"
        if self.hard_mode and self.t.dimension == 2:
            raise ValueError(
                "LabelMode 'average_hard' is the legacy 3D evaluator mode "
                "(/root/reference/evaluate.py is 3D-only)")
        blend_impl = self.e.blend_impl
        if blend_impl == "auto":
            # pallas measured 14% faster at dense stride (BENCHMARKS.md
            # "Whole-volume inference"); it is an unsharded-3D-grid kernel.
            # Per-volume geometry eligibility (Mosaic tile alignment) is
            # checked inside SlidingWindowInference.__call__, which falls
            # back to the XLA blend for grids the kernel cannot lower
            # (sliding_window.pallas_blend_eligible).
            blend_impl = ("pallas"
                          if mesh is None and self.t.dimension == 3
                          else "xla")
        elif blend_impl == "pallas" and mesh is not None:
            import warnings
            warnings.warn(
                "BlendImpl 'pallas' is not implemented for sharded patch "
                "grids (>1 device); falling back to the XLA scatter-add",
                stacklevel=2)
            blend_impl = "xla"
        self.engine = SlidingWindowInference(
            apply_fn, self.t.patch_shape, self.e.stride, self.e.batch_size,
            self.t.num_classes, gaussian_blend=self.e.gaussian_blend,
            mesh=mesh, hard_accumulate=self.hard_mode,
            blend_impl=blend_impl)
        # 2D: the whole slice stack rides ONE device dispatch (the
        # per-slice loop costs a ~27 ms dispatch floor per slice through
        # the remote-TPU tunnel); self.engine stays as the per-slice
        # fallback for ragged transformed shapes
        self.engine_stacked = (SlidingWindowInference(
            apply_fn, self.t.patch_shape, self.e.stride, self.e.batch_size,
            self.t.num_classes, gaussian_blend=self.e.gaussian_blend,
            mesh=mesh, blend_impl="xla" if blend_impl == "pallas" else blend_impl,
            slice_stacked=True) if self.t.dimension == 2 else None)
        if mesh is not None:
            # weights may come from a trainer mesh with fewer devices;
            # re-replicate them onto the evaluation mesh
            from ..parallel.mesh import replicated
            self.variables = jax.device_put(self.variables, replicated(mesh))

    # ------------------------------------------------------------------
    def _restore_variables(self):
        """Restore weights from ``EvaluationSetting.CheckpointPath`` (a
        checkpoint directory; the reference's meta-graph path,
        `model.py:1138-1139`)."""
        from ..train.checkpoints import CheckpointManager
        from ..train.trainer import Trainer

        trainer = Trainer(self.config, log=False)
        template = trainer.init_state()
        path = self.e.checkpoint_path or self.t.ckpt_dir
        mgr = CheckpointManager(path)
        # weights only: evaluation must not depend on how the checkpoint
        # was optimized (different optimizer name / optax state layout)
        restored = mgr.restore_latest_partial(
            {"params": template.params, "batch_stats": template.batch_stats})
        if restored is None:
            raise FileNotFoundError(
                f"No checkpoint found under {path!r}")
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}

    # ------------------------------------------------------------------
    def _eval_transforms(self):
        pipeline_cfg = load_pipeline(self.e.pipeline_path)
        return build_pipeline(pipeline_cfg, "evaluate", self.t.dimension)

    def _prepare_case(self, case_dir: str) -> Optional[dict]:
        images = []
        for fname in self.e.image_filenames:
            path = os.path.join(case_dir, fname)
            if not os.path.exists(path):
                return None
            images.append(read_image(path))
        label = zeros_like_geometry(images[0])
        return {"image": images, "label": label}

    # ------------------------------------------------------------------
    def evaluate_single_3d(self, sample, transforms):
        """`model.py:817-977` semantics; returns (label, probs | None)."""
        original = sample["image"][0]  # geometry snapshot of the input grid

        for tfm in transforms:
            sample = tfm(sample)

        # safety pad to patch size (the YAML normally holds a Padding step)
        images = [pad_to_size(im, self.t.patch_shape, LINEAR)
                  for im in sample["image"]]
        transformed_geom = images[0]

        volume = _stack_channels(images)
        acc, weight = self.engine(self.variables, volume)
        acc = np.asarray(acc)
        weight = np.asarray(weight)

        if self.hard_mode:
            # legacy averaging of hard predictions: channel 0 holds the
            # pred sum; rint(sum/visits + 0.01) (`evaluate.py:264-271`)
            label_np = np.rint(
                acc[..., 0] / np.maximum(weight, 1e-12) + 0.01
            ).astype(np.uint8)
            acc = acc[..., 1:]  # softmax channels for the prob maps
        else:
            label_np = np.argmax(acc, axis=-1).astype(np.uint8)  # model.py:934
        label_tfm = transformed_geom.like(label_np)
        label = resample_like(label_tfm, original, NEAREST)

        if not self.e.probability_output:
            return label, None

        probs = []
        for c in range(self.t.num_classes):
            prob_np = acc[..., c] / np.maximum(weight, 1e-12)
            prob_tfm = transformed_geom.like(prob_np.astype(np.float32))
            probs.append(resample_like(prob_tfm, original, LINEAR))
        return label, probs

    # ------------------------------------------------------------------
    def evaluate_single_2d(self, sample, transforms):
        """`model.py:979-1129`: per-z-slice 2D sliding window, results
        pasted back into the volume.

        Host-side per-slice transforms are unchanged; the device side
        stacks every transformed plane and runs the WHOLE slice stack as
        one jitted patch grid (``slice_stacked`` engine) — identical math
        to the per-slice loop, which remains as the fallback when the
        transformed slices come out ragged."""
        images3d, label3d = sample["image"], sample["label"]
        for tfm in transforms["3D"]:
            sample = tfm(sample)
            images3d, label3d = sample["image"], sample["label"]

        out_label = np.zeros(images3d[0].GetSize(), np.uint8)
        out_probs = (np.zeros((self.t.num_classes,) + images3d[0].GetSize(),
                              np.float32)
                     if self.e.probability_output else None)

        nz = images3d[0].GetSize()[2]
        planes, geoms, orig_slices = [], [], []
        for z in range(nz):
            slice_imgs = [extract_slice(im, z) for im in images3d]
            slice_lbl = extract_slice(label3d, z)
            orig_slices.append(slice_imgs[0])

            s = {"image": slice_imgs, "label": slice_lbl}
            for tfm in transforms["2D"]:
                s = tfm(s)
            slice_imgs = [pad_to_size(im, self.t.patch_shape, LINEAR)
                          for im in s["image"]]
            geoms.append(slice_imgs[0])
            planes.append(_stack_channels(slice_imgs))

        if (self.engine_stacked is not None and planes
                and all(p.shape == planes[0].shape for p in planes)):
            # (Z, H, W, C): one dispatch for the whole volume
            acc3, w3 = self.engine_stacked(self.variables, np.stack(planes))
            acc3 = np.asarray(acc3)
            w3 = np.asarray(w3)
            per_slice = [(acc3[z], w3[z]) for z in range(nz)]
        else:  # ragged transformed shapes: per-slice engine calls
            per_slice = []
            for plane in planes:
                acc, weight = self.engine(self.variables, plane)
                per_slice.append((np.asarray(acc), np.asarray(weight)))

        for z, (acc, weight) in enumerate(per_slice):
            geom, orig_slice = geoms[z], orig_slices[z]
            lbl_np = np.argmax(acc, axis=-1).astype(np.uint8)
            lbl = resample_like(geom.like(lbl_np), orig_slice, NEAREST)
            out_label[:, :, z] = lbl.data
            if out_probs is not None:
                for c in range(self.t.num_classes):
                    p = acc[..., c] / np.maximum(weight, 1e-12)
                    pr = resample_like(geom.like(p.astype(np.float32)),
                                       orig_slice, LINEAR)
                    out_probs[c, :, :, z] = pr.data

        label = images3d[0].like(out_label)
        if out_probs is None:
            return label, None
        probs = [images3d[0].like(out_probs[c])
                 for c in range(self.t.num_classes)]
        return label, probs

    # ------------------------------------------------------------------
    def evaluate_case(self, case_dir: str):
        sample = self._prepare_case(case_dir)
        if sample is None:
            return None
        transforms = self._eval_transforms()
        if self.t.dimension == 2:
            label, probs = self.evaluate_single_2d(sample, transforms)
        else:
            label, probs = self.evaluate_single_3d(sample, transforms)

        if self.e.largest_connected_component:  # model.py:1218-1219
            label = extract_largest_connected_component(label)
        if self.e.volume_threshold > 0:  # model.py:1222-1223
            label = volume_threshold(label, self.e.volume_threshold)
            if self.e.mask_probability_with_label and probs is not None:
                # legacy MaskNegatedImageFilter semantics: keep the prob
                # map only where the thresholded label is ZERO
                # (`/root/reference/evaluate.py:316-323`)
                mask = np.asarray(label.data) != 0
                probs = [pr.like(np.where(mask, 0.0, pr.data)
                                 .astype(np.float32)) for pr in probs]
        return label, probs

    def evaluate(self, max_cases: Optional[int] = None):
        """Loop over the evaluation directory and write outputs
        (`model.py:1172-1243`). ``max_cases`` truncates the case list
        (diagnostic probes — e.g. eval_only.py --max-cases)."""
        results = []
        cases = list_cases(self.e.data_dir)
        if max_cases is not None:
            cases = cases[:max_cases]
        for case in cases:
            case_dir = os.path.join(self.e.data_dir, case)
            out = self.evaluate_case(case_dir)
            if out is None:
                print(f"Image file not found at {case_dir}")
                continue
            label, probs = out
            label_path = os.path.join(case_dir, self.e.label_filename)
            write_image(label, label_path)
            results.append(label_path)
            if probs is not None:
                stem, ext = self._split_name(self.e.probability_filename)
                for c, prob in enumerate(probs):
                    class_id = self.t.segmentation_classes[c]
                    write_image(prob, os.path.join(
                        case_dir, f"{stem}_{class_id}{ext}"))
        return results

    @staticmethod
    def _split_name(filename: str) -> Tuple[str, str]:
        parts = filename.split(".")
        return parts[0], "".join("." + p for p in parts[1:])
