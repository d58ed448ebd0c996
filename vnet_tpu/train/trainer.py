"""Training orchestrator: jitted SPMD train step, epoch loop, checkpointing,
TensorBoard logging.

This is the TPU-native counterpart of the reference's ``image2label.train``
(`/root/reference/model.py:632-815`), with its feed_dict-per-step session
loop (`model.py:726-794`) replaced by a single jitted, donated train step
sharded over a device mesh:

* data parallelism: batches shard over the mesh ``data`` axis; gradient
  all-reduce is compiled by XLA from the replicated-parameter sharding —
  no hand-written collectives needed.
* epoch/step/resume semantics match §5.4 of SURVEY.md: checkpoint every
  ``LogInterval`` steps and at each epoch end under a ``checkpoint-latest``
  pointer (`model.py:758-764, 806-808`); the epoch counter is part of the
  checkpointed state so resume continues the epoch count
  (`model.py:668-669, 716`); ``Restore=False`` wipes log+ckpt dirs
  (`model.py:678-687`); ``MaxIterations`` aborts training
  (`model.py:727-728`); an optional test batch runs every ``TestStep``
  steps into a second TensorBoard writer (`model.py:767-794`).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..data import (BatchLoader, NiftiDataset2D, NiftiDataset3D,
                    build_pipeline)
from ..config import load_pipeline
from ..models import build_network
from ..ops.losses import segmentation_loss
from ..ops.metrics import batch_metrics
from ..parallel.mesh import (batch_sharding, make_mesh, pad_batch_to_multiple,
                             replicated)
from .optim import build_optimizer
from . import checkpoints as ckpt_lib


class TrainState(struct.PyTreeNode):
    """Replicated training state (a pytree; orbax-serializable)."""

    step: jnp.ndarray
    epoch: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclass
class TrainStepOutput:
    loss: float
    aux: Dict[str, float]
    metrics: Dict[str, float]


def make_train_step(network, tx, loss_cfg, num_classes: int,
                    is_attention: bool, compute_metrics: bool = True,
                    device_augment=None, compute_auc: bool = False):
    """Build the pure train-step function (to be jitted with donation).

    For attention-gated networks the step takes an extra ``distance_maps``
    array and adds the gate's distance-map regression loss
    (`train.py:383-401, 415-417` semantics: total = seg + attention).

    ``device_augment``: optional ``(flip_axes tuple, noise_sigma)`` — the
    RandomFlip/RandomNoise tail fused into the step on device
    (`vnet_tpu/data/device_aug.py`) instead of running per-sample on host.
    """

    def step_fn(state: TrainState, images, labels, rng, distance_maps=None):
        dropout_rng = jax.random.fold_in(rng, state.step)
        if device_augment is not None:
            from ..data.device_aug import random_flip, random_noise
            flip_axes, noise_sigma = device_augment
            aug_rng = jax.random.fold_in(dropout_rng, 7)
            if flip_axes:
                kf, aug_rng = jax.random.split(aug_rng)
                images, labels = random_flip(kf, images, labels, flip_axes)
                if distance_maps is not None:
                    # same key -> same per-sample coin: the gate's
                    # regression target flips with its image/label (the
                    # distance transform is flip-equivariant, so flipping
                    # the precomputed map equals recomputing it)
                    _, distance_maps = random_flip(
                        kf, images, distance_maps, flip_axes)
            if noise_sigma > 0.0:
                images = random_noise(aug_rng, images, noise_sigma)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = network.apply(
                variables, images, train=True,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            extra = {}
            if is_attention:
                logits, att_logits = out
            else:
                logits = out
            loss, aux = segmentation_loss(
                logits, labels, name=loss_cfg.name, num_classes=num_classes,
                weights=loss_cfg.weights, alpha=loss_cfg.alpha)
            if is_attention and distance_maps is not None:
                from ..models import attention_distance_loss
                att_loss = attention_distance_loss(
                    att_logits, distance_maps, kind=loss_cfg.attention_kind,
                    scale=loss_cfg.attention_scale)
                aux = dict(aux)
                aux["attention_loss"] = att_loss
                loss = loss + att_loss
                aux["total_loss"] = loss
            return loss, (aux, mutated["batch_stats"], logits)

        (loss, (aux, new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = (batch_metrics(logits, labels, num_classes,
                                  compute_auc=compute_auc)
                   if compute_metrics else {})
        return new_state, loss, aux, metrics

    return step_fn


def make_eval_step(network, loss_cfg, num_classes: int, is_attention: bool,
                   compute_auc: bool = False):
    """Loss+metrics on a test batch without updating anything
    (`model.py:784-789`)."""

    def step_fn(state: TrainState, images, labels):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        from ..models import eval_apply
        out = eval_apply(network, variables, images)
        logits = out[0] if is_attention else out
        loss, aux = segmentation_loss(
            logits, labels, name=loss_cfg.name, num_classes=num_classes,
            weights=loss_cfg.weights, alpha=loss_cfg.alpha)
        return loss, aux, batch_metrics(logits, labels, num_classes,
                                        compute_auc=compute_auc)

    return step_fn


class Trainer:
    """End-to-end training driver, configured like the reference CLI."""

    def __init__(self, config: Config, mesh=None, log: bool = True):
        self.config = config
        self.t = config.train
        sp = max(int(self.t.mesh_space_parallel), 1)
        if mesh is not None:
            self.mesh = mesh
        elif self.t.mesh_dcn_parallel > 1:
            from ..parallel.mesh import make_multislice_mesh
            self.mesh = make_multislice_mesh(
                ici_data_parallel=self.t.mesh_data_parallel,
                dcn_data_parallel=self.t.mesh_dcn_parallel,
                space_parallel=sp)
        else:
            dp = self.t.mesh_data_parallel
            if dp <= 0:
                # the data axis must divide the global batch: use the largest
                # device count that does (within the space-parallel budget)
                import math
                dp = math.gcd(self.t.batch_size, len(jax.devices()) // sp)
            self.mesh = make_mesh(dp, space_parallel=sp,
                                  devices=jax.devices()[:dp * sp])
        self.log_enabled = log
        self.dtype = (jnp.bfloat16 if self.t.precision == "bfloat16"
                      else jnp.float32)

        net_cfg = self.t.network
        name = "AttentionVNet" if net_cfg.attention else net_cfg.name
        self.is_attention = name == "AttentionVNet"
        self.network = build_network(
            name, num_classes=self.t.num_classes,
            dropout_rate=net_cfg.dropout, num_channels=net_cfg.num_channel,
            num_levels=net_cfg.num_levels,
            num_convolutions=net_cfg.num_convolutions,
            bottom_convolutions=net_cfg.bottom_convolutions,
            norm=net_cfg.norm,
            packed_target_lanes=net_cfg.packed_target_lanes,
            dropout_impl=net_cfg.dropout_impl, remat=net_cfg.remat,
            legacy_double_norm=(net_cfg.name == "VNetLegacy"),
            dw_impl=net_cfg.dw_impl,
            dtype=self.dtype)

        self.tx, self.lr_schedule = build_optimizer(self.t.optimizer)
        self._train_step_fn = None
        self._eval_step_fn = None
        self._writers = {}
        self._device_aug = None  # (flip_axes, noise_sigma) when enabled

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def batch_shape(self) -> Tuple[int, ...]:
        return (self.t.batch_size, *self.t.patch_shape, self.t.input_channels)

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.t.seed)
        dummy = jnp.zeros(self.batch_shape(), jnp.float32)
        variables = self.network.init(
            {"params": rng, "dropout": rng}, dummy, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(
            step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
            params=params, batch_stats=batch_stats,
            opt_state=self.tx.init(params))
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------
    def _build_steps(self):
        if self._train_step_fn is not None:
            return
        raw = make_train_step(self.network, self.tx, self.t.loss,
                              self.t.num_classes, self.is_attention,
                              device_augment=self._device_aug,
                              compute_auc=self.t.compute_auc)
        bsh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        if self.is_attention:
            self._train_step_fn = jax.jit(
                lambda state, images, labels, rng, dmaps: raw(
                    state, images, labels, rng, dmaps),
                in_shardings=(rep, bsh, bsh, rep, bsh),
                out_shardings=rep,
                donate_argnums=(0,))
        else:
            self._train_step_fn = jax.jit(
                raw,
                in_shardings=(rep, bsh, bsh, rep),
                out_shardings=rep,
                donate_argnums=(0,))
        raw_eval = make_eval_step(self.network, self.t.loss,
                                  self.t.num_classes, self.is_attention,
                                  compute_auc=self.t.compute_auc)
        self._eval_step_fn = jax.jit(
            raw_eval, in_shardings=(rep, bsh, bsh), out_shardings=rep)

        if self.t.scan_steps > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS, SPACE_AXIS
            # keep spatial partitioning active for the stacked super-batch
            # (S, B, *spatial): same spec as batch_sharding, scan-dim major
            if (SPACE_AXIS in self.mesh.shape
                    and self.mesh.shape[SPACE_AXIS] > 1):
                super_sh = NamedSharding(self.mesh,
                                         P(None, DATA_AXIS, SPACE_AXIS))
            else:
                super_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))

            def multi(state, images, labels, rng):
                def body(st, inp):
                    st, loss, aux, metrics = raw(st, inp[0], inp[1], rng)
                    return st, (loss, aux, metrics)
                state, outs = jax.lax.scan(body, state, (images, labels))
                return state, outs

            self._scan_step_fn = jax.jit(
                multi, in_shardings=(rep, super_sh, super_sh, rep),
                out_shardings=rep, donate_argnums=(0,))

    def train_step(self, state: TrainState, images: np.ndarray,
                   labels: np.ndarray, rng,
                   distance_maps: Optional[np.ndarray] = None,
                   ) -> Tuple[TrainState, TrainStepOutput]:
        self._build_steps()
        from ..parallel.mesh import shard_batch_per_host
        from ..utils.retry import retry_transient
        # per-host feeding: each process contributes its local cases and
        # the batch assembles globally (multi-slice/multi-host safe).
        # H2D transfers are retried on transient runtime failures (the
        # documented tunnel FAILED_PRECONDITION, preemption UNAVAILABLE);
        # the host arrays stay alive so a retry is safe — the jitted step
        # itself is NOT retried (donated buffers die with a failed call).
        images = retry_transient(shard_batch_per_host, self.mesh,
                                 np.asarray(images, np.float32))
        labels = retry_transient(shard_batch_per_host, self.mesh,
                                 np.asarray(labels, np.int32))
        if self.is_attention:
            if distance_maps is None:
                distance_maps = np.zeros(labels.shape, np.float32)
            state, loss, aux, metrics = self._train_step_fn(
                state, images, labels, rng,
                retry_transient(shard_batch_per_host, self.mesh,
                                np.asarray(distance_maps, np.float32)))
        else:
            state, loss, aux, metrics = self._train_step_fn(
                state, images, labels, rng)
        # values stay on device: converting here would synchronize the host
        # with every step and stall the dispatch pipeline. Consumers
        # (logging) convert lazily — float() works on 0-d jax arrays.
        out = TrainStepOutput(loss=loss, aux=dict(aux), metrics=dict(metrics))
        return state, out

    def train_steps_scanned(self, state: TrainState, images: np.ndarray,
                            labels: np.ndarray, rng):
        """Run ``scan_steps`` optimizer steps in one jitted call over a
        stacked super-batch ``(K, B, ...)``. Returns
        ``(state, [TrainStepOutput x K])`` — dropout keys derive from the
        in-scan step counter, so each sub-step gets fresh randomness.
        """
        self._build_steps()
        from ..utils.retry import retry_transient
        # transfer the super-batch explicitly (retryable) before the
        # donated jitted call
        dev_images = retry_transient(jnp.asarray, images, jnp.float32)
        dev_labels = retry_transient(jnp.asarray, labels, jnp.int32)
        state, (losses, auxs, metricss) = self._scan_step_fn(
            state, dev_images, dev_labels, rng)
        outs = []
        k = losses.shape[0]
        for i in range(k):
            outs.append(TrainStepOutput(
                loss=losses[i],
                aux={kk: v[i] for kk, v in auxs.items()},
                metrics={kk: v[i] for kk, v in metricss.items()}))
        return state, outs

    def eval_step(self, state: TrainState, images, labels) -> TrainStepOutput:
        self._build_steps()
        loss, aux, metrics = self._eval_step_fn(
            state, jnp.asarray(images, jnp.float32),
            jnp.asarray(labels, jnp.int32))
        return TrainStepOutput(loss=loss, aux=dict(aux),
                               metrics=dict(metrics))

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def build_loader(self, data_dir: str, phase: str) -> BatchLoader:
        pipeline_cfg = load_pipeline(self.t.pipeline_path)
        transforms = build_pipeline(pipeline_cfg, phase, self.t.dimension)
        if (self.t.device_augment and phase == "train"
                and self.t.dimension == 3):
            transforms = self._extract_device_augment(transforms)
        if self.t.dimension == 2:
            ds = NiftiDataset2D(
                data_dir, self.t.image_filenames, self.t.label_filename,
                transforms3D=transforms["3D"], transforms2D=transforms["2D"],
                train=True, labels=self.t.segmentation_classes,
                min_pixel=self.t.min_pixel, drop_ratio=self.t.drop_ratio,
                cache_cases=self.t.cache_cases)
        else:
            ds = NiftiDataset3D(
                data_dir, self.t.image_filenames, self.t.label_filename,
                transforms=transforms, train=True,
                labels=self.t.segmentation_classes,
                attention=self.is_attention,
                cache_cases=self.t.cache_cases)
        return BatchLoader(ds, self.t.batch_size, shuffle=True,
                           drop_remainder=True,
                           num_workers=self.t.loader_workers,
                           backend=self.t.loader_backend,
                           seed=self.t.seed)

    def _extract_device_augment(self, transforms):
        """Pull RandomFlip/RandomNoise out of the host chain; their
        parameters move into the jitted step (config ``DeviceAugment``).
        Must be called before the step functions compile."""
        from ..data.transforms3d import RandomFlip, RandomNoise
        kept = []
        flip_axes = ()
        noise_sigma = 0.0
        for tfm in transforms:
            if isinstance(tfm, RandomFlip):
                flip_axes = tuple(i for i, f in enumerate(tfm.axes) if f)
            elif isinstance(tfm, RandomNoise):
                noise_sigma = float(tfm.sigma)
            else:
                kept.append(tfm)
        if flip_axes or noise_sigma > 0.0:
            if self._train_step_fn is not None:
                raise RuntimeError(
                    "device augment params resolved after step compile")
            self._device_aug = (flip_axes, noise_sigma)
        return kept

    # ------------------------------------------------------------------
    # logging
    # ------------------------------------------------------------------
    def _writer(self, tag: str):
        if not self.log_enabled:
            return None
        if tag not in self._writers:
            from tensorboardX import SummaryWriter
            self._writers[tag] = SummaryWriter(
                os.path.join(self.t.log_dir, tag))
        return self._writers[tag]

    def _log_scalars(self, tag: str, step: int, out: TrainStepOutput) -> float:
        """Write TB scalars (host-syncing the step's values) and return the
        loss as a float."""
        loss = float(out.loss)
        w = self._writer(tag)
        if w is None:
            return loss
        class_ids = self.t.segmentation_classes
        w.add_scalar("loss/0.total_loss", loss, step)
        for k, v in out.aux.items():
            if k != "total_loss":
                w.add_scalar(f"loss/{k}", float(v), step)
        w.add_scalar("learning_rate", float(self.lr_schedule(step)), step)
        for k, v in out.metrics.items():
            if "_" in k and k.rsplit("_", 1)[-1].isdigit():
                base, idx = k.rsplit("_", 1)
                k = f"{base}_{class_ids[int(idx)]}"  # index -> class id
            w.add_scalar(f"metrics/{k}", float(v), step)
        return loss

    def _log_images(self, tag: str, step: int, state: TrainState,
                    images: np.ndarray, labels: np.ndarray):
        """ImageLog feature (model.py:315-334, 449-463, 570-585)."""
        w = self._writer(tag)
        if w is None:
            return
        from .images import log_batch_images
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        from ..models import eval_apply
        out = eval_apply(self.network, variables,
                         jnp.asarray(images, jnp.float32))
        logits = out[0] if self.is_attention else out
        softmax = np.asarray(jax.nn.softmax(logits, axis=-1))
        pred = np.argmax(softmax, axis=-1)
        log_batch_images(w, tag, np.asarray(images), np.asarray(labels),
                         softmax, pred, self.t.segmentation_classes, step)

    # ------------------------------------------------------------------
    def _write_network_sidecar(self, ckpt_dir: str) -> None:
        """Persist the architecture next to the checkpoints. The reference
        restored the full meta-graph at evaluation (`model.py:1138-1139`)
        so the architecture traveled with the weights; the sidecar gives
        the flag-style `evaluate.py` CLI (which has no network flags, like
        the reference's) the same property."""
        import json

        net = self.t.network
        sidecar = {
            "Networks": {
                "Name": net.name, "Dropout": net.dropout,
                "NumChannel": net.num_channel, "NumLevels": net.num_levels,
                "NumConvolutions": list(net.num_convolutions),
                "BottomConvolutions": net.bottom_convolutions,
                "Attention": net.attention, "Norm": net.norm,
                "PackedTargetLanes": net.packed_target_lanes,
                "DropoutImpl": net.dropout_impl, "Remat": net.remat,
                "DwImpl": net.dw_impl,
            },
            "SegmentationClasses": list(self.t.segmentation_classes),
            "PatchShape": list(self.t.patch_shape),
            "Precision": self.t.precision,
        }
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, "network_config.json")
        with open(path, "w") as f:
            json.dump(sidecar, f, indent=2)

    # ------------------------------------------------------------------
    # the loop
    # ------------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None) -> TrainState:
        t = self.t
        if not t.restore:
            for d in (t.log_dir, t.ckpt_dir):  # model.py:678-687
                if os.path.exists(d):
                    shutil.rmtree(d)
                os.makedirs(d, exist_ok=True)

        state = self.init_state()
        mgr = ckpt_lib.CheckpointManager(t.ckpt_dir)
        self._write_network_sidecar(t.ckpt_dir)
        if t.restore:
            restored = mgr.restore_latest(state)
            if restored is not None:
                state = jax.device_put(restored, replicated(self.mesh))
                print(f"Restored checkpoint at step {int(state.step)}, "
                      f"epoch {int(state.epoch)}")

        try:
            return self._train_loop(state, mgr, max_steps)
        finally:
            mgr.wait_until_finished()  # drain async checkpoint writes

    def _train_loop(self, state: TrainState, mgr, max_steps):
        t = self.t
        train_loader = self.build_loader(t.data_dir, "train")
        test_loader = (self.build_loader(t.test_data_dir, "test")
                       if t.testing and t.test_data_dir else None)
        test_iter = iter(()) if test_loader is None else iter(test_loader.epoch())

        rng = jax.random.key(t.seed + 1, impl=t.rng_impl)
        from ..profiler import StepTimer
        timer = StepTimer(warmup=2)
        limit = t.max_iterations if max_steps is None else max_steps

        start_epoch = int(state.epoch)
        # the scan buffer carries ACROSS epochs: with few batches per epoch
        # a per-epoch buffer would silently drop every partial group and
        # train nothing while appearing to run
        scan_k = self.t.scan_steps if not self.is_attention else 1
        scan_buf = []
        for epoch in range(start_epoch, t.epochs):
            epoch_loss, count = 0.0, 0
            t0 = time.time()
            step = int(state.step)
            pending = None  # (step, out) logged one step late so the host
            # fetch overlaps the next step's device execution
            epoch_batches = 0
            for batch in train_loader.epoch():
                epoch_batches += 1
                images, labels, *rest = batch
                dmaps = rest[0] if rest else None
                if step >= limit:
                    print(f"Reach maximum iteration steps, training abort.")
                    mgr.save(state)
                    return state
                if scan_k > 1:
                    scan_buf.append((images, labels))
                    if len(scan_buf) < scan_k:
                        continue
                    sim = np.stack([b[0] for b in scan_buf])
                    slb = np.stack([b[1] for b in scan_buf])
                    scan_buf = []
                    with timer:
                        state, outs = self.train_steps_scanned(state, sim,
                                                               slb, rng)
                        # sync so the block timing is real, not dispatch
                        float(outs[-1].loss)
                    for out in outs:
                        step += 1
                        if pending is not None:
                            epoch_loss += self._log_scalars("train", *pending)
                            count += 1
                        pending = (step, out)
                    w = self._writer("train")
                    if w is not None and timer.times:
                        # per-step perf scalars in the ScanSteps path too:
                        # the K-step block amortizes dispatch, so report
                        # block_time / K per optimizer step
                        per_step = timer.times[-1] / scan_k
                        w.add_scalar("perf/step_time_s", per_step, step)
                        w.add_scalar("perf/patches_per_s",
                                     t.batch_size / per_step, step)
                else:
                    with timer:
                        state, out = self.train_step(
                            state, images, labels, rng, distance_maps=dmaps)
                    step += 1
                    if pending is not None:
                        epoch_loss += self._log_scalars("train", *pending)
                        count += 1
                    pending = (step, out)
                    w = self._writer("train")
                    if w is not None and timer.times:
                        w.add_scalar("perf/step_time_s", timer.times[-1], step)
                        w.add_scalar(
                            "perf/patches_per_s",
                            t.batch_size / timer.times[-1], step)

                if step % t.log_interval == 0:
                    mgr.save(state)
                    if t.image_log:
                        self._log_images("train", step, state, images, labels)

                if test_loader is not None and step % t.test_step == 0:
                    test_batch = None
                    try:
                        test_batch = next(test_iter)
                    except StopIteration:
                        test_iter = iter(test_loader.epoch())
                        try:
                            test_batch = next(test_iter)
                        except StopIteration:
                            print("Testing enabled but the test dataset "
                                  "yields no batches (fewer cases than "
                                  "BatchSize?); disabling inline testing.")
                            test_loader = None
                    if test_batch is not None:
                        timages, tlabels, *_ = test_batch
                        tout = self.eval_step(state, timages, tlabels)
                        self._log_scalars("test", step, tout)
                        if t.image_log:  # test images (model.py:790-793)
                            self._log_images("test", step, state, timages,
                                             tlabels)

            if epoch_batches == 0:
                # drop_remainder + cases < BatchSize would otherwise spin
                # through every epoch training NOTHING — fail loudly
                raise ValueError(
                    "Training dataset yields no batches: fewer cases than "
                    f"BatchSize={t.batch_size} with drop_remainder (the "
                    "reference's tf.data semantics). Lower BatchSize or add "
                    "training cases.")
            if pending is not None:
                epoch_loss += self._log_scalars("train", *pending)
                count += 1
            dt = time.time() - t0
            if count:
                print(f"Epoch {epoch + 1}: loss {epoch_loss / count:.4f} "
                      f"({count} steps, {dt:.1f}s)")
            state = state.replace(epoch=state.epoch + 1)
            # epoch-end checkpoint (model.py:806-808); CheckpointEveryNEpochs
            # thins these when epochs are short and save I/O dominates
            # wall-clock (observed: 3-20 s orbax waits per 3-step epoch
            # through the remote tunnel)
            n_ck = max(1, t.ckpt_every_n_epochs)
            if (epoch + 1) % n_ck == 0 or epoch + 1 == t.epochs:
                mgr.save(state)  # the final epoch always persists
        return state
