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
