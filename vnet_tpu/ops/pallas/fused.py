"""Pallas TPU kernels for the hot paths.

Two kernels back the compute-path flags (both validated against their XLA
reference implementations in ``tests/test_pallas.py``, which runs them in
interpreter mode on CPU; on TPU they compile to Mosaic):

* ``fused_bias_prelu_residual`` — the V-Net conv-block tail
  (bias add + residual add + PReLU, `networks.py:307-322`) as one
  VMEM-tiled elementwise pass. XLA usually fuses this into the conv
  epilogue already; the kernel exists for the cases where the residual
  add's extra operand defeats fusion, and as the substrate for deeper
  epilogue fusion (norm folding) later.

* ``blend_accumulate`` — the sliding-window scatter-add
  (`vnet_tpu/infer/sliding_window.py`): per patch, DMA the accumulator
  block HBM->VMEM, add the windowed softmax, DMA back. Grid iterations on
  TPU run sequentially per core, so read-modify-write per patch is
  race-free; ``input_output_aliases`` keeps the accumulators in place
  instead of XLA's copy-on-write dynamic-update-slice chains.

The flat layout trick: accumulate over the *flattened* volume using
per-patch-row DMA windows, so arbitrary (non-block-aligned) patch offsets
work without element-granular BlockSpecs.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# fused bias + residual + PReLU
# ---------------------------------------------------------------------------


def _bias_prelu_residual_kernel(x_ref, res_ref, bias_ref, alpha_ref, out_ref):
    x = x_ref[:] + bias_ref[:] + res_ref[:]
    alpha = alpha_ref[:]
    out_ref[:] = jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def fused_bias_prelu_residual(x, residual, bias, alpha, *,
                              interpret: bool = False):
    """``prelu(x + bias + residual)`` with per-channel bias/alpha.

    Args:
      x, residual: ``(..., C)`` same shape.
      bias, alpha: ``(C,)``.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    x2 = x.reshape(rows, c)
    r2 = residual.reshape(rows, c)
    b2 = jnp.broadcast_to(bias, (1, c))
    a2 = jnp.broadcast_to(alpha, (1, c))

    # row-tile to bound VMEM usage
    tile = min(rows, 1024)
    while rows % tile:
        tile -= 1
    grid = (rows // tile,)

    out = pl.pallas_call(
        _bias_prelu_residual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        interpret=interpret,
    )(x2, r2, b2, a2)
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# BatchNorm statistics reductions
# ---------------------------------------------------------------------------


def bn_stats(x, *, tile_rows: int = 0, interpret: bool = False):
    """Per-channel ``(sum, sum_of_squares)`` over all leading dims, f32.

    One bandwidth-bound pass: row tiles stream HBM->VMEM once; both moments
    accumulate in a VMEM f32 scratch (TPU grid iterations are sequential
    per core, so the accumulator carries across iterations). XLA's
    equivalent ``convert_reduce`` fusions measured ~14x off roofline for
    the V-Net's big packed activations (BENCHMARKS.md).

    Args:
      x: ``(..., C)`` any float dtype.
    Returns:
      ``(sum, sumsq)`` — each ``(C,)`` float32.
    """
    c = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    x2 = x.reshape(rows, c)

    tile = tile_rows or min(rows, 4096)
    while rows % tile:
        tile -= 1
    grid = (rows // tile,)

    def kernel(x_ref, sum_ref, sq_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        xf = x_ref[:].astype(jnp.float32)
        acc[0, :] += jnp.sum(xf, axis=0)
        acc[1, :] += jnp.sum(xf * xf, axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            sum_ref[:] = acc[0:1, :]
            sq_ref[:] = acc[1:2, :]

    s, sq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x2)
    return s[0], sq[0]


def bn_grad_stats(dy, x, mean, invstd, *, tile_rows: int = 0,
                  interpret: bool = False):
    """Per-channel ``(sum(dy), sum(dy * xhat))`` with
    ``xhat = (x - mean) * invstd`` — the two reductions of the BatchNorm
    backward, in one streaming pass over ``dy`` and ``x``.

    Args:
      dy, x: ``(..., C)`` same shape; mean, invstd: ``(C,)``.
    Returns:
      ``(sum_dy, sum_dy_xhat)`` — each ``(C,)`` float32.
    """
    c = x.shape[-1]
    rows = int(np.prod(x.shape[:-1]))
    dy2 = dy.reshape(rows, c)
    x2 = x.reshape(rows, c)
    mean2 = jnp.asarray(mean, jnp.float32).reshape(1, c)
    inv2 = jnp.asarray(invstd, jnp.float32).reshape(1, c)

    tile = tile_rows or min(rows, 2048)
    while rows % tile:
        tile -= 1
    grid = (rows // tile,)

    def kernel(dy_ref, x_ref, mean_ref, inv_ref, sdy_ref, sdx_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        dyf = dy_ref[:].astype(jnp.float32)
        xhat = (x_ref[:].astype(jnp.float32) - mean_ref[:]) * inv_ref[:]
        acc[0, :] += jnp.sum(dyf, axis=0)
        acc[1, :] += jnp.sum(dyf * xhat, axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            sdy_ref[:] = acc[0:1, :]
            sdx_ref[:] = acc[1:2, :]

    sdy, sdx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(dy2, x2, mean2, inv2)
    return sdy[0], sdx[0]


# ---------------------------------------------------------------------------
# sliding-window blend accumulate
# ---------------------------------------------------------------------------


def blend_accumulate_patches(acc, probs, starts, *, slab_bytes: int = 1 << 21,
                             start_multiples=None, interpret: bool = False):
    """Scatter-add pre-windowed patch contributions into a volume
    accumulator, in place — the sliding-window blend of
    `vnet_tpu/infer/sliding_window.py` (reference semantics
    `/root/reference/model.py:919-929`) as one Pallas pass.

    Per patch slab, one strided DMA pulls the accumulator region
    HBM->VMEM, the (already window-scaled) contribution adds in VMEM,
    and one DMA pushes it back. TPU grid iterations run sequentially per
    core, so overlapping patches are race-free; ``input_output_aliases``
    updates the accumulator in place, avoiding XLA's copy-on-write
    ``dynamic_update_slice`` chains.

    The kernel is rank-generic and has NO channel concept: every axis of
    ``acc`` is sliced by a per-patch start. Mosaic lane-pads the MINOR
    axis to 128, so a channel-last accumulator with C=4 would compile to
    a 32x-padded memref (observed: 512^3 x4 -> a 512^3 x128 f32 memref,
    68 GB, HTTP 500 from the remote compile helper). Callers must
    therefore FOLD a small trailing channel axis into the last spatial
    axis — ``acc.reshape(D, H, W*C)``, starts scaled by C — which keeps
    patch regions contiguous and the minor dim lane-aligned (the
    sliding-window caller carries the blend-weight plane as one of those
    folded channels so weight accumulation rides the same DMA).

    Args:
      acc: rank-N float32 volume — donated/aliased in place.
      probs: ``(B, *block)`` float32 contributions, ``len(block) == N``,
        window pre-applied.
      starts: ``(B, N)`` int32 block start corners (any alignment, incl.
        the clamped last starts of `model.py:881-893`; on real TPU the
        minor-axis offsets are ``stride*C`` multiples after the fold).
      slab_bytes: VMEM budget per slab; the block's leading axis is
        split into equal slabs no larger than this.
      start_multiples: optional ``N`` static ints — a guaranteed divisor
        of every start value per dim. Starts are prefetch scalars, so
        Mosaic cannot see that e.g. a stride-32 grid keeps the sublane
        dim 8-aligned and rejects the dynamic DMA slice ("failed to
        prove that a tile index in dimension 1 is divisible by the
        tiling (8)"). The sliding-window caller computes the gcd of the
        (static) start grid per dim and passes it here; the kernel
        attaches it via ``pl.multiple_of``. On real TPU the second-minor
        dim needs multiple 8 and the minor dim 128 (f32 memref tiling) —
        i.e. ``stride % 8 == 0`` and ``stride * C % 128 == 0`` after the
        channel fold; otherwise Mosaic still (correctly) rejects.
    Returns the updated ``acc``.
    """
    b = probs.shape[0]
    block = probs.shape[1:]
    n = len(block)
    assert starts.shape == (b, n), (starts.shape, b, n)
    assert acc.ndim == n, (acc.shape, block)

    # split the block's leading axis into slabs within the VMEM budget
    tail = int(np.prod(block[1:])) * 4
    slab = max(1, min(block[0], slab_bytes // max(tail, 1)))
    while block[0] % slab:
        slab -= 1
    n_slabs = block[0] // slab
    slab_shape = (slab,) + tuple(block[1:])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_slabs),
        in_specs=[
            pl.BlockSpec((1,) + slab_shape,
                         lambda i, s, starts: (i, s) + (0,) * (n - 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM(slab_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    mults = tuple(start_multiples) if start_multiples else (1,) * n
    assert len(mults) == n, (mults, n)

    def _hinted(value, mult):
        return pl.multiple_of(value, mult) if mult > 1 else value

    def kernel(starts_ref, probs_blk, acc_in, acc_out, scratch, sem):
        del acc_in  # aliased into acc_out
        i = pl.program_id(0)
        s = pl.program_id(1)
        idx = (pl.ds(_hinted(starts_ref[i, 0], math.gcd(mults[0], slab))
                     + s * slab, slab),)
        for d in range(1, n):
            idx += (pl.ds(_hinted(starts_ref[i, d], mults[d]), block[d]),)
        region = acc_out.at[idx]

        cp_in = pltpu.make_async_copy(region, scratch, sem)
        cp_in.start()
        cp_in.wait()
        scratch[:] = scratch[:] + probs_blk[0]
        cp_out = pltpu.make_async_copy(scratch, region, sem)
        cp_out.start()
        cp_out.wait()

    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(acc.shape, acc.dtype)],
        input_output_aliases={2: 0},  # acc in place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, probs, acc)
    return out


def blend_accumulate_rows(acc, weight, probs, window, row_starts, *,
                          interpret: bool = False):
    """Scatter-add ``probs * window`` into flat accumulators.

    This is the 1D building block: callers flatten contiguous patch rows
    (fixed-length row segments of the volume) and pass one start offset per
    segment.

    Args:
      acc: ``(R, C)`` float32 — flattened accumulator rows.
      weight: ``(R, 1)`` float32.
      probs: ``(N, rows, C)`` — per-segment contributions.
      window: ``(rows, 1)`` blend weight.
      row_starts: ``(N,)`` int32 row offsets into ``acc``.
    Returns updated ``(acc, weight)`` (buffers donated/aliased).
    """
    n, rows, c = probs.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, starts: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i, starts: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, c), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(starts_ref, probs_blk, window_blk, acc_in, w_in,
               acc_out, w_out, acc_scratch, w_scratch, sem_a, sem_w):
        del acc_in, w_in  # aliased into acc_out / w_out
        i = pl.program_id(0)
        start = starts_ref[i]

        in_a = pltpu.make_async_copy(
            acc_out.at[pl.ds(start, rows), :], acc_scratch, sem_a)
        in_w = pltpu.make_async_copy(
            w_out.at[pl.ds(start, rows), :], w_scratch, sem_w)
        in_a.start()
        in_w.start()
        in_a.wait()
        in_w.wait()

        acc_scratch[:] = acc_scratch[:] + probs_blk[0] * window_blk[:]
        w_scratch[:] = w_scratch[:] + window_blk[:]

        out_a = pltpu.make_async_copy(
            acc_scratch, acc_out.at[pl.ds(start, rows), :], sem_a)
        out_w = pltpu.make_async_copy(
            w_scratch, w_out.at[pl.ds(start, rows), :], sem_w)
        out_a.start()
        out_w.start()
        out_a.wait()
        out_w.wait()

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(acc.shape, acc.dtype),
                   jax.ShapeDtypeStruct(weight.shape, weight.dtype)],
        input_output_aliases={3: 0, 4: 1},  # acc, weight in-place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row_starts, probs, window, acc, weight)
