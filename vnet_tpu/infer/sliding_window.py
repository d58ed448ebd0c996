"""Overlap-tiled sliding-window inference with on-device blending.

TPU-native replacement for the reference's evaluation inner loop
(`/root/reference/model.py:817-977`): there, patches are sliced on the host
by a multiprocessing pool (`model.py:905-908`), fed batch-by-batch through
``sess.run`` and blended in host numpy (`model.py:919-929`). Here the whole
volume lives in HBM and one jitted function runs the entire patch grid:

* the static patch grid (strided starts with last-patch clamping exactly as
  `model.py:866-893`) is precomputed on host as an ``(N, rank)`` index
  array — data-independent, so the compiled loop is shape-stable per
  volume shape;
* a ``lax.fori_loop`` over patch batches gathers patches with
  ``dynamic_slice`` (vmapped), runs the network forward once per batch
  (large, MXU-friendly), and scatter-adds softmax and blend weight into
  accumulators with read-modify-write ``dynamic_update_slice``;
* blending weight is uniform visit-count (reference parity,
  `model.py:929`) or an optional separable cosine^2 (Hann) window that
  down-weights patch borders — the standard fix for seam artifacts.

Compiled functions are cached per (volume shape, grid size); the grid is
padded to a whole number of (per-device) batches with rows flagged
invalid — padded patches still run through the network (static shapes)
but contribute ZERO blend weight, so the blended field is exactly the
real grid's regardless of batch size or device count.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def patch_starts_1d(dim: int, patch: int, stride: int) -> list:
    """Strided starts with last-start clamping (`model.py:866-893`)."""
    n = int(math.ceil((dim - patch) / float(stride))) + 1
    n = max(n, 1)
    starts = []
    for i in range(n):
        s = i * stride
        if s + patch > dim:
            s = dim - patch
        starts.append(max(s, 0))
    return starts


def build_patch_grid(volume_shape: Sequence[int], patch_shape: Sequence[int],
                     stride: Sequence[int]) -> np.ndarray:
    """All patch start corners, (N, rank) int32, same enumeration order as
    the reference's i/j/k loops (`model.py:874-900`)."""
    axes = [patch_starts_1d(volume_shape[i], patch_shape[i], stride[i])
            for i in range(len(patch_shape))]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1).astype(np.int32)


def pallas_blend_eligible(start_multiples: Sequence[int],
                          patch_shape: Sequence[int],
                          folded_channels: int) -> bool:
    """Whether ``blend_accumulate_patches`` can lower at this grid geometry
    on real TPU.

    Mosaic tiles f32 memrefs ``(8, 128)`` on the last two dims, and the
    kernel's dynamic accumulator slice must be PROVABLY tile-aligned from
    the static ``pl.multiple_of`` hints alone (`ops/pallas/fused.py`
    ``start_multiples`` doc): after the channel fold the minor axis
    carries ``W*C``, so every minor start and the minor block extent must
    be 128-multiples, and the second-minor ones 8-multiples. Observed
    rejection at LiTS geometry (stride 16 x Cc=4 -> folded minor gcd 64):
    "Failed to prove that a tile index in dimension 2 is divisible by the
    tiling (128)" — a compile-time HTTP 500 through the remote helper, so
    callers must decide per volume BEFORE tracing the kernel.
    """
    minor_mult = start_multiples[-1] * folded_channels
    minor_block = patch_shape[-1] * folded_channels
    if minor_mult % 128 or minor_block % 128:
        return False
    if len(patch_shape) >= 2:
        if start_multiples[-2] % 8 or patch_shape[-2] % 8:
            return False
    return True


def cosine_window(patch_shape: Sequence[int]) -> np.ndarray:
    """Separable Hann^1 window, floored so every voxel keeps support."""
    ws = []
    for p in patch_shape:
        x = (np.arange(p) + 0.5) / p
        ws.append(np.clip(np.sin(np.pi * x), 0.05, None))
    w = ws[0]
    for axis_w in ws[1:]:
        w = np.multiply.outer(w, axis_w)
    return w.astype(np.float32)


class SlidingWindowInference:
    """Jitted overlap-tiled inference for one network.

    Args:
      apply_fn: ``apply_fn(variables, patches) -> logits`` (eval mode).
      patch_shape / stride: rank-2 or rank-3 tuples (config
        ``PatchShape`` / ``EvaluationSetting.Stride``).
      batch_size: patches per forward pass (``EvaluationSetting.BatchSize``).
      num_classes: output channels.
      gaussian_blend: cosine-window blending instead of uniform.
    """

    def __init__(self, apply_fn, patch_shape: Sequence[int],
                 stride: Sequence[int], batch_size: int, num_classes: int,
                 gaussian_blend: bool = False, mesh=None,
                 mesh_axis: str = "data", hard_accumulate: bool = False,
                 blend_impl: str = "xla", slice_stacked: bool = False,
                 z_bucket: int = 8):
        self.apply_fn = apply_fn
        self.patch_shape = tuple(int(p) for p in patch_shape)
        self.stride = tuple(int(s) for s in stride)
        self.batch_size = int(batch_size)
        self.num_classes = int(num_classes)
        self.rank = len(self.patch_shape)
        # slice_stacked: 2D patch grid over a STACK of slices — volume is
        # ``(Z, H, W, C)``, the start grid gains a leading z column, and
        # every slice's patches ride the same fori_loop. Replaces the 2D
        # evaluator's per-slice engine re-entry (`model.py:1002-1124` runs
        # a sess.run patch loop per slice) with ONE device dispatch per
        # volume — on the tunneled TPU each dispatch costs ~27 ms, so a
        # 64-slice volume saves ~1.7 s of pure dispatch floor.
        self.slice_stacked = bool(slice_stacked)
        if self.slice_stacked and self.rank != 2:
            raise ValueError("slice_stacked requires a 2D patch shape")
        if self.slice_stacked and hard_accumulate:
            raise ValueError("slice_stacked excludes hard_accumulate "
                             "(the legacy averaging mode is 3D-only)")
        # Z-bucketing: pad the slice stack (with zero slices and flag-0
        # grid rows) to a multiple of z_bucket so volumes differing only
        # in slice count share one compiled program — otherwise every
        # distinct Z forces a fresh XLA compile, which through the remote
        # tunnel costs minutes against the ~27 ms/slice dispatch savings.
        # Waste is bounded: <= z_bucket-1 slices of forward compute, all
        # flag-0 (zero blend weight, exact results).
        self.z_bucket = max(int(z_bucket), 1)
        self.blend_window = (cosine_window(self.patch_shape)
                             if gaussian_blend else
                             np.ones(self.patch_shape, np.float32))
        # Optional SPMD: shard the patch grid over a mesh axis; each device
        # blends its sub-grid into a local accumulator, then one psum
        # assembles the volume (SURVEY.md §5.7's eval-grid sharding).
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # hard_accumulate: ALSO accumulate the per-patch hard prediction
        # (integer argmax as float) in an extra leading channel — the
        # legacy evaluator's averaging mode, `/root/reference/evaluate.py:
        # 264-271`: label = rint(sum(pred)/visits + 0.01). Channel 0 of the
        # returned accumulator is the pred sum; channels 1..C the softmax.
        self.hard_accumulate = bool(hard_accumulate)
        # blend_impl: "xla" scatter-adds via dynamic_update_slice chains;
        # "pallas" routes the accumulation through one in-place DMA kernel
        # (`ops/pallas/fused.py::blend_accumulate_patches`) with the blend
        # weight riding as an extra accumulator channel. Identical math.
        if blend_impl not in ("xla", "pallas"):
            raise ValueError(f"blend_impl must be 'xla'|'pallas', "
                             f"got {blend_impl!r}")
        if blend_impl == "pallas" and mesh is not None:
            raise NotImplementedError(
                "blend_impl='pallas' with a sharded patch grid is not "
                "supported; use the XLA blend under shard_map")
        if blend_impl == "pallas" and self.slice_stacked:
            raise NotImplementedError(
                "blend_impl='pallas' is a 3D volume kernel; slice-stacked "
                "2D grids use the XLA blend")
        self.blend_impl = blend_impl
        self._compiled = {}

    # ------------------------------------------------------------------
    def _make_jitted(self, vol_shape: Tuple[int, ...], num_batches: int,
                     start_multiples: Tuple[int, ...], impl: str):
        # start_multiples is required (advisor r3): the pallas branch
        # indexes start_multiples[rank-1], so a () default would be an
        # advertised-but-invalid signature for impl='pallas'. impl is the
        # PER-VOLUME blend choice — self.blend_impl='pallas' falls back to
        # 'xla' for grids Mosaic cannot prove tile-aligned (see
        # pallas_blend_eligible).
        patch = self.patch_shape
        B = self.batch_size
        C = vol_shape[-1]
        rank = self.rank
        # start rows carry a leading z coordinate in slice-stacked mode,
        # plus a trailing validity flag (0 = grid-padding row: the patch
        # runs but contributes zero blend weight)
        idx_width = rank + 1 if self.slice_stacked else rank
        window = jnp.asarray(self.blend_window)

        def gather(volume, starts):
            if self.slice_stacked:
                def one(s):
                    p = jax.lax.dynamic_slice(
                        volume, tuple(s[i] for i in range(idx_width)) + (0,),
                        (1,) + patch + (C,))
                    return p.reshape(patch + (C,))
            else:
                def one(s):
                    return jax.lax.dynamic_slice(
                        volume, tuple(s[i] for i in range(rank)) + (0,),
                        patch + (C,))
            return jax.vmap(one)(starts)

        varying_axis = self.mesh_axis if self.mesh is not None else None

        acc_channels = self.num_classes + (1 if self.hard_accumulate else 0)

        if impl == "pallas":
            from ..ops.pallas import blend_accumulate_patches, is_tpu_backend
            # CPU (tests / virtual meshes) runs the TPU interpreter; the
            # blend kernel is deterministic so interpret mode is exact
            interpret = not is_tpu_backend()

            def run_pallas(variables, volume, starts):
                # blend weight rides as channel 0 so non-uniform windows
                # accumulate exactly alongside the softmax channels. The
                # channel axis is FOLDED into the last spatial axis before
                # the kernel: Mosaic lane-pads the minor dim to 128, and a
                # C=4 minor dim would compile to a 32x-padded accumulator
                # (68 GB at 512^3 — the remote compile helper rejects it).
                # Folded, the minor dim is W*C (lane-aligned) and patch
                # regions stay contiguous.
                Cc = 1 + acc_channels
                vol_spatial = vol_shape[:-1]
                acc = jnp.zeros(vol_spatial[:-1] + (vol_spatial[-1] * Cc,),
                                jnp.float32)

                def body(b, acc):
                    batch_starts = jax.lax.dynamic_slice(
                        starts, (b * B, 0), (B, idx_width + 1))
                    patches = gather(volume, batch_starts)
                    logits = self.apply_fn(variables, patches)
                    probs = jax.nn.softmax(logits.astype(jnp.float32),
                                           axis=-1)
                    if self.hard_accumulate:
                        pred = jnp.argmax(probs, axis=-1)
                        probs = jnp.concatenate(
                            [pred.astype(jnp.float32)[..., None], probs],
                            axis=-1)
                    wb = jnp.broadcast_to(window[None, ..., None],
                                          (B,) + patch + (1,))
                    contrib = jnp.concatenate(
                        [wb, probs * window[..., None]], axis=-1)
                    # grid-padding rows contribute nothing
                    flags = batch_starts[:, idx_width].astype(jnp.float32)
                    contrib = contrib * flags.reshape((B,) + (1,) * (rank + 1))
                    contrib = contrib.reshape(
                        (B,) + patch[:-1] + (patch[-1] * Cc,))
                    starts_f = jnp.concatenate(
                        [batch_starts[:, :rank - 1],
                         batch_starts[:, rank - 1:rank] * Cc], axis=1)
                    # static divisibility of the (folded) start grid —
                    # starts are prefetch scalars inside the kernel, so
                    # Mosaic needs this hint to prove the dynamic DMA
                    # slice is tile-aligned (sublane 8 / lane 128)
                    mults = start_multiples[:rank - 1] + (
                        start_multiples[rank - 1] * Cc,)
                    return blend_accumulate_patches(
                        acc, contrib, starts_f, start_multiples=mults,
                        interpret=interpret)

                acc = jax.lax.fori_loop(0, num_batches, body, acc)
                acc = acc.reshape(vol_spatial + (Cc,))
                return acc[..., 1:], acc[..., 0]

            return jax.jit(run_pallas)

        def run(variables, volume, starts):
            acc = jnp.zeros(vol_shape[:-1] + (acc_channels,), jnp.float32)
            weight = jnp.zeros(vol_shape[:-1], jnp.float32)
            if varying_axis is not None:
                # inside shard_map the per-device accumulators are varying
                # (they depend on the sharded starts); mark the zero init
                # accordingly so the fori_loop carry types line up.
                acc = jax.lax.pvary(acc, (varying_axis,))
                weight = jax.lax.pvary(weight, (varying_axis,))

            patch_block = ((1,) + patch) if self.slice_stacked else patch
            win_block = window[None] if self.slice_stacked else window

            def body(b, carry):
                acc, weight = carry
                batch_starts = jax.lax.dynamic_slice(
                    starts, (b * B, 0), (B, idx_width + 1))
                patches = gather(volume, batch_starts)
                logits = self.apply_fn(variables, patches)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                if self.hard_accumulate:
                    pred = jnp.argmax(probs, axis=-1).astype(jnp.float32)
                    probs = jnp.concatenate([pred[..., None], probs], axis=-1)
                probs = probs * window[..., None]

                def scatter(j, carry):
                    acc, weight = carry
                    s = tuple(batch_starts[j, i] for i in range(idx_width))
                    # grid-padding rows (flag 0) contribute nothing
                    flag = batch_starts[j, idx_width].astype(jnp.float32)
                    cur = jax.lax.dynamic_slice(acc, s + (0,),
                                                patch_block + (acc_channels,))
                    upd = probs[j][None] if self.slice_stacked else probs[j]
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + upd * flag, s + (0,))
                    curw = jax.lax.dynamic_slice(weight, s, patch_block)
                    weight = jax.lax.dynamic_update_slice(
                        weight, curw + win_block * flag, s)
                    return acc, weight

                return jax.lax.fori_loop(0, B, scatter, (acc, weight))

            acc, weight = jax.lax.fori_loop(0, num_batches, body, (acc, weight))
            return acc, weight

        if self.mesh is None:
            return jax.jit(run)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.mesh_axis

        def sharded_run(variables, volume, starts):
            acc, weight = run(variables, volume, starts)
            return (jax.lax.psum(acc, axis), jax.lax.psum(weight, axis))

        return jax.jit(shard_map(
            sharded_run, mesh=self.mesh,
            in_specs=(P(), P(), P(axis)), out_specs=(P(), P())))

    # ------------------------------------------------------------------
    def __call__(self, variables, volume: np.ndarray):
        """Run the full grid over ``volume`` (``(*spatial, C)``, already at
        least patch-sized per axis; ``(Z, H, W, C)`` in slice-stacked mode
        with (H, W) at least patch-sized).

        Returns ``(softmax_sum, weight)`` as device arrays — callers
        compute ``argmax(softmax_sum)`` for the label (the division by
        weight cancels in argmax, `model.py:934`) and
        ``softmax_sum / weight`` for probability maps (`model.py:935-937`).
        """
        vol_shape = tuple(volume.shape)
        spatial = vol_shape[1:-1] if self.slice_stacked else vol_shape[:-1]
        for i in range(self.rank):
            if spatial[i] < self.patch_shape[i]:
                raise ValueError(
                    f"volume {vol_shape} smaller than patch "
                    f"{self.patch_shape}; pad first")

        starts = build_patch_grid(spatial, self.patch_shape, self.stride)
        nz_real = None
        grid_floor = 0
        if self.slice_stacked:
            # cross the per-slice (H, W) grid with every REAL z: rows
            # (z, y, x); the stack itself is padded to the z bucket so
            # different slice counts reuse one compiled program. Padding
            # REPEATS the last real slice (not zeros). Grid rows never
            # reference the padded slices (flag-0 rows repeat the last
            # REAL row below), but with ``norm="batch_stats"`` (the
            # reference's BN eval semantics, model.py:917) every patch in
            # a batch feeds the shared batch statistics, so real content
            # is the safe invariant should the row padding ever change.
            nz_real = vol_shape[0]
            zb = self.z_bucket
            nz_pad = ((nz_real + zb - 1) // zb) * zb
            if nz_pad != nz_real:
                vol_np = np.asarray(volume)
                volume = np.concatenate(
                    [vol_np,
                     np.repeat(vol_np[-1:], nz_pad - nz_real, axis=0)])
                vol_shape = tuple(volume.shape)
            m = starts.shape[0]
            zs = np.repeat(np.arange(nz_real, dtype=np.int32), m)
            starts = np.concatenate(
                [zs[:, None], np.tile(starts, (nz_real, 1))], axis=-1)
            grid_floor = nz_pad * m  # row count at the bucketed Z
        n = starts.shape[0]
        # pad the grid so it splits evenly into batches (and, when sharded,
        # into per-device grids) — and, when slice-stacked, up to the
        # bucketed row count so num_batches is bucket-stable; padded rows
        # carry validity flag 0 and contribute zero blend weight, so
        # results are exactly the real grid's
        ndev = (self.mesh.shape[self.mesh_axis]
                if self.mesh is not None else 1)
        quantum = self.batch_size * ndev
        total = ((max(n, grid_floor) + quantum - 1) // quantum) * quantum
        num_batches = total // quantum  # per-device batch count
        pad = total - n
        if pad:
            starts = np.concatenate([starts, np.repeat(starts[-1:], pad, 0)])
        impl = self.blend_impl
        start_multiples: Tuple[int, ...] = ()
        if impl == "pallas":
            # static per-dim divisibility of the whole grid (pads repeat a
            # real row, so they don't change the gcd); an all-zero column
            # (single-patch axis) divides anything — use a huge power of 2
            start_multiples = tuple(
                int(np.gcd.reduce(starts[:, d])) or (1 << 20)
                for d in range(self.rank))
            from ..ops.pallas import is_tpu_backend
            Cc = 1 + self.num_classes + (1 if self.hard_accumulate else 0)
            if is_tpu_backend() and not pallas_blend_eligible(
                    start_multiples, self.patch_shape, Cc):
                # Mosaic would reject the dynamic DMA slice at this
                # geometry (compile-time, through the remote helper) —
                # use the XLA scatter-add for this volume only. Interpret
                # mode (CPU tests) has no tiling constraint.
                impl = "xla"
                start_multiples = ()
        flags = np.ones((total, 1), np.int32)
        flags[n:] = 0
        starts = np.concatenate([starts, flags], axis=-1)

        key = (vol_shape, num_batches, start_multiples, impl)
        if key not in self._compiled:
            self._compiled[key] = self._make_jitted(vol_shape, num_batches,
                                                    start_multiples, impl)
        # whole-volume H2D transfers are the documented transient-failure
        # site on the tunneled TPU — retryable, host array stays alive
        from ..utils.retry import retry_transient
        dev_volume = retry_transient(jnp.asarray, volume)
        acc, weight = self._compiled[key](variables, dev_volume,
                                          jnp.asarray(starts))
        if nz_real is not None and vol_shape[0] != nz_real:
            acc, weight = acc[:nz_real], weight[:nz_real]
        return acc, weight
