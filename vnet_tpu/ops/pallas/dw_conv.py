"""Pallas TPU weight-gradient (dW) kernel for stride-1 channels-last convs.

The round-4 trace accounting (BENCHMARKS.md "Final round-4 accounting")
proved the last XLA-level inefficiency in the training step: XLA's
``conv_backprop_filter`` wants the contracted batch dimension minor while
the forward convs produce (and the rest of the backward pass consumes)
channel-minor activations, so layout assignment inserts
``{4,0,3,2,1} <-> {0,4,3,2,1}`` HBM round trips around every large dW —
30.8 ms/step of pure copies at b96, ~550 GB/s each way on the 805 MB L1
activations. The CustomDw dot-formulation trace proved the conflict is
formulation-independent; the only remaining route is a hand kernel that
reads the forward (channel-minor, default) layout natively and does the
"transpose" as part of the MXU contraction in VMEM. This is that kernel.

    dW[kx,ky,kz,ci,co] = sum_{b,x,y,z} x[b, x+kx-lo_x, ...] * g[b,x,y,z,co]

Formulation: for each kernel offset, the contraction is
``A^T B`` with ``A = x_window  [N, Ci_tile]`` and ``B = g [N, Co_tile]``
over ``N = X*Y*ZC`` flattened positions — the contracted dimension rides
the *sublanes* of both operands (the MXU's native "transposed LHS"
dataflow), so no operand ever transposes in HBM. The activation arrives
pre-padded (one cheap XLA pad, ~1/10 the cost of the copy pair it
replaces); z is chunked with a (k-1)-halo via element-granular indexing
(``pl.Element``), x/y live whole in VMEM.

Grid ``(ci_tiles, co_tiles, B, Z_chunks)``: the f32 output block
``[prod(k), ci_t, co_t]`` stays VMEM-resident and accumulates across the
(B, Z_chunks) axes (sequential on TPU), written back once per (ci, co)
tile. Scope: rank-3, stride 1, no dilation, Ci/Co multiples of the lane
width (the packed V-Net hot convs: L1/L2 with C in {128, 256}).

Reference hot loop being replaced: `/root/reference/networks.py:307-322`
(its dW is implicit in TF's ``conv3d_backprop_filter``).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# largest VMEM bytes allowed for one (double-buffered) input block
_BLOCK_BUDGET = 3 * 1024 * 1024


def _dw_kernel(x_ref, g_ref, out_ref, *, kernel_spatial, g_dims):
    """One grid step: accumulate all kernel-offset contractions for this
    (ci, co, b, z-chunk) into the resident f32 output block."""
    b_idx = pl.program_id(2)
    z_idx = pl.program_id(3)

    @pl.when(jnp.logical_and(b_idx == 0, z_idx == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    kx, ky, kz = kernel_spatial
    X, Y, ZC = g_dims
    ci_t = x_ref.shape[-1]
    co_t = g_ref.shape[-1]
    g2 = g_ref[...].reshape(X * Y * ZC, co_t)
    for ikx in range(kx):
        for iky in range(ky):
            for ikz in range(kz):
                a = x_ref[ikx:ikx + X, iky:iky + Y, ikz:ikz + ZC, :]
                a2 = a.reshape(X * Y * ZC, ci_t)
                acc = jax.lax.dot_general(
                    a2, g2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                idx = (ikx * ky + iky) * kz + ikz
                out_ref[idx, :, :] += acc


def _sublane_tile(itemsize: int) -> int:
    """Mosaic's second-minor tile for this dtype (f32 8, bf16 16, i8 32)."""
    return 8 * 4 // itemsize


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_z_chunk(X, Y, Z, k, ci_t, itemsize) -> Tuple[int, int]:
    """(zc, zb): z-chunk + x-block z extent honouring Mosaic tiling.

    Mosaic requires a block's second-minor dim to be a multiple of the
    dtype's sublane tile (or equal the full array dim) — the interp-mode
    tests don't enforce this, the real TPU lowering does. So candidate
    chunks are Z itself, then sublane-aligned divisors of Z descending;
    the x-block extent zb is the (k-1)-halo window rounded up to the
    tile (the kernel never reads the rounding tail — the caller pads the
    array so the last window's block stays in bounds). Picks the largest
    candidate whose padded x-block fits the VMEM budget, else the
    smallest aligned one.
    """
    m = _sublane_tile(itemsize)
    cands = [Z] + [d for d in range(Z - m, 0, -m) if Z % d == 0]
    for zc in cands:
        zb = _round_up(zc + k - 1, m)
        block = (X + k - 1) * (Y + k - 1) * zb * ci_t * itemsize
        if block <= _BLOCK_BUDGET:
            return zc, zb
    zc = cands[-1]
    return zc, _round_up(zc + k - 1, m)


def dw_conv_supported(x_shape, g_shape, kernel_spatial,
                      pads: Tuple[Tuple[int, int], ...]) -> bool:
    """True when the Pallas dW kernel covers this conv (rank 3, stride 1
    implied by equal spatial dims, lane-aligned channels, pads within the
    kernel window)."""
    if len(x_shape) != 5 or len(g_shape) != 5:
        return False
    if x_shape[0] != g_shape[0] or x_shape[1:4] != g_shape[1:4]:
        return False
    ci, co = x_shape[-1], g_shape[-1]
    if ci % LANES or co % LANES:
        return False
    for k, (lo, hi) in zip(kernel_spatial, pads):
        if lo + hi != k - 1 or lo < 0 or hi < 0:
            return False
    return True


@partial(jax.jit, static_argnames=("kernel_spatial", "pads", "interpret"))
def dw_conv_pallas(x: jnp.ndarray, g: jnp.ndarray,
                   kernel_spatial: Tuple[int, int, int],
                   pads: Tuple[Tuple[int, int], ...],
                   interpret: bool = None) -> jnp.ndarray:
    """Weight gradient of a stride-1 channels-last rank-3 conv.

    x: (B, X, Y, Z, Ci) forward input; g: (B, X, Y, Z, Co) output grad;
    returns dW (kx, ky, kz, Ci, Co) float32.

    ``interpret=None``: auto — compiled Mosaic on TPU backends, the
    Pallas interpreter elsewhere (keeps CPU tests/dev runs working;
    real training with DwImpl=pallas is a TPU configuration).
    """
    if interpret is None:
        from . import is_tpu_backend
        interpret = not is_tpu_backend()
    assert dw_conv_supported(x.shape, g.shape, kernel_spatial, pads)
    B, X, Y, Z, Ci = x.shape
    Co = g.shape[-1]
    kx, ky, kz = kernel_spatial

    ci_t = min(Ci, LANES)
    co_t = min(Co, LANES)
    zc, zb = _pick_z_chunk(X, Y, Z, max(kx, ky, kz), ci_t,
                           max(x.dtype.itemsize, g.dtype.itemsize))
    grid = (Ci // ci_t, Co // co_t, B, Z // zc)

    # halo pad (lo, hi) per axis, plus a z tail so the LAST chunk's
    # tile-rounded zb-extent block stays in bounds (the kernel only
    # reads the first zc+kz-1 rows of each block; the tail is dead)
    z_tail = (Z // zc - 1) * zc + zb - (Z + kz - 1)
    (xl, xh), (yl, yh), (zl, zh) = pads
    xp = jnp.pad(x, ((0, 0), (xl, xh), (yl, yh), (zl, zh + z_tail),
                     (0, 0)))

    kkk = kx * ky * kz
    out = pl.pallas_call(
        partial(_dw_kernel, kernel_spatial=kernel_spatial,
                g_dims=(X, Y, zc)),
        grid=grid,
        in_specs=[
            # Mosaic: a buffer with ANY Element dim must be all Element
            # (Squeezed allowed) — index_map entries are then ELEMENT
            # offsets, so the ci entry is ci * ci_t, not the block index
            pl.BlockSpec(
                (None, pl.Element(X + kx - 1), pl.Element(Y + ky - 1),
                 pl.Element(zb), pl.Element(ci_t)),
                lambda ci, co, b, z: (b, 0, 0, z * zc, ci * ci_t)),
            pl.BlockSpec(
                (None, X, Y, zc, co_t),
                lambda ci, co, b, z: (b, 0, 0, z, co)),
        ],
        out_specs=pl.BlockSpec(
            (kkk, ci_t, co_t), lambda ci, co, b, z: (0, ci, co)),
        out_shape=jax.ShapeDtypeStruct((kkk, Ci, Co), jnp.float32),
        interpret=interpret,
    )(xp, g)
    return out.reshape(kx, ky, kz, Ci, Co)


# ---------------------------------------------------------------------------
# drop-in conv with the Pallas dW in its VJP


def _dw_xla(x, g, pads, rank):
    """XLA reference dW (conv_vjp.py dw spec — used out of kernel scope
    and as the test oracle)."""
    from ..conv_vjp import _SPECS
    return jax.lax.conv_general_dilated(
        x, g, (1,) * rank, pads, dimension_numbers=_SPECS[rank]["dw"])


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_pallas_dw(x: jnp.ndarray, w: jnp.ndarray,
                   pads: Tuple[Tuple[int, int], ...]) -> jnp.ndarray:
    """``lax.conv_general_dilated(x, w, 1, pads)`` (channels-last) whose
    VJP computes dW with :func:`dw_conv_pallas` when in scope (falling
    back to the XLA formulation otherwise). Same contract as
    :func:`vnet_tpu.ops.conv_vjp.conv_custom_dw`."""
    from ..conv_vjp import _SPECS
    rank = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, (1,) * rank, pads, dimension_numbers=_SPECS[rank]["fwd"])


def _fwd(x, w, pads):
    return conv_pallas_dw(x, w, pads), (x, w)


def _bwd(pads, res, g):
    from ..conv_vjp import _SPECS
    x, w = res
    rank = x.ndim - 2
    spec = _SPECS[rank]
    _, vjp_x = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, w, (1,) * rank, pads, dimension_numbers=spec["fwd"]), x)
    (dx,) = vjp_x(g)
    kernel_spatial = tuple(w.shape[:rank])
    if dw_conv_supported(x.shape, g.shape, kernel_spatial, tuple(pads)):
        dw = dw_conv_pallas(x, g, kernel_spatial, tuple(pads))
    else:
        dw = _dw_xla(x, g, tuple(pads), rank)
    return dx, dw.astype(w.dtype)


conv_pallas_dw.defvjp(_fwd, _bwd)
