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
over ``N = XC*Y*ZC`` flattened positions — the contracted dimension rides
the *sublanes* of both operands (the MXU's native "transposed LHS"
dataflow), so no operand ever transposes in HBM.

Halo handling WITHOUT an HBM pad (an explicit ``jnp.pad`` of the 805 MB
activation costs ~as much as the copy pair this kernel eliminates), and
WITHOUT low-side window padding (Mosaic element windows reject it:
"Low padding not supported yet"): both x and g windows START at the
chunk origin and extend HIGH only —

    x window [s, s + chunk + (k-1-lo)),  g window [s, s + chunk + lo)

and each kernel offset ``o`` picks which operand's slice shifts:
``o >= lo`` slides x by ``o-lo`` (the usual form); ``o < lo`` uses the
substitution q = p-(lo-o) to slide g by ``lo-o`` instead — the low-halo
terms are exactly the conv's zero-padding and drop out. Window content
beyond the array (declared high padding; content UNDEFINED — interp
fills NaN) is zeroed in VMEM once per grid step via a mask computed
from the grid position; every offset slice then reads the masked
blocks. x/g are chunked over z (sublane-tile-aligned chunks,
tile-rounded window extents — Mosaic requires the block's second-minor
dim be a multiple of the dtype's sublane tile) and over x (a major dim,
any divisor of X) so every buffer fits the VMEM budget:

    grid (ci_tiles, co_tiles, B, Z_chunks, X_chunks)

The f32 output block ``[prod(k), ci_t, co_t]`` stays VMEM-resident and
accumulates across the trailing (B, Z, X) grid axes (sequential on TPU),
written back once per (ci, co) tile. Shape scope (``dw_conv_supported``):
rank-3, stride 1, no dilation, lane-aligned channels, pads within the
kernel window. Perf scope in the conv VJP (``conv_pallas_dw``):
additionally ``prod(k) <= _PERF_SCOPE_KKK`` — the packed V-Net's big
k=3^3 sites (the 32^3-domain L0/L1 activations where the copy cost
concentrates); larger packed kernels (45/75/125 offsets) stay on the XLA
formulation, keeping the Mosaic compile load on the remote compile
helper bounded.

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
# VMEM bytes allowed for one grid step's buffers: x block x3 (double
# buffering + the masked VMEM copy), g block x2, the resident out block
_VMEM_BUDGET = 12 * 1024 * 1024
# conv VJP uses the kernel only below this many kernel offsets
_PERF_SCOPE_KKK = 27


def _mask_high(ref, starts, valids):
    """Zero window content beyond the array's high edge (declared-
    padding content is undefined). starts/valids are per spatial dim;
    the window's leading coordinate is its chunk origin, so only the
    high side needs masking."""
    shape = ref.shape[:3] + (1,)
    sx, sy, sz = starts
    X, Y, Z = valids
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + sx
    iy = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + sy
    iz = jax.lax.broadcasted_iota(jnp.int32, shape, 2) + sz
    valid = (ix < X) & (iy < Y) & (iz < Z)
    return jnp.where(valid, ref[...], jnp.zeros((), ref.dtype))


def _dw_kernel(x_ref, g_ref, out_ref, *, kernel_spatial, chunks,
               valid_extents, pads_lo):
    """One grid step: mask both windows' high OOB, then accumulate all
    kernel-offset contractions for this (ci, co, b, z, x) step into the
    resident f32 output block. Offsets o >= lo slide the x slice by
    o-lo; offsets o < lo slide the g slice by lo-o (module docstring)."""
    b_idx = pl.program_id(2)
    z_idx = pl.program_id(3)
    x_idx = pl.program_id(4)

    @pl.when(jnp.logical_and(b_idx == 0,
                             jnp.logical_and(z_idx == 0, x_idx == 0)))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    kx, ky, kz = kernel_spatial
    xc, Y, zc = chunks
    X, Yf, Z = valid_extents
    xl, yl, zl = pads_lo
    ci_t = x_ref.shape[-1]
    co_t = g_ref.shape[-1]

    sx = x_idx * xc
    sz = z_idx * zc
    a_all = _mask_high(x_ref, (sx, 0, sz), (X, Yf, Z))
    g_all = _mask_high(g_ref, (sx, 0, sz), (X, Yf, Z))

    n = xc * Y * zc
    for ikx in range(kx):
        ax, gx = max(ikx - xl, 0), max(xl - ikx, 0)
        for iky in range(ky):
            ay, gy = max(iky - yl, 0), max(yl - iky, 0)
            for ikz in range(kz):
                az, gz = max(ikz - zl, 0), max(zl - ikz, 0)
                a = a_all[ax:ax + xc, ay:ay + Y, az:az + zc, :]
                b = g_all[gx:gx + xc, gy:gy + Y, gz:gz + zc, :]
                acc = jax.lax.dot_general(
                    a.reshape(n, ci_t), b.reshape(n, co_t),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                idx = (ikx * ky + iky) * kz + ikz
                out_ref[idx, :, :] += acc


def _sublane_tile(itemsize: int) -> int:
    """Mosaic's second-minor tile for this dtype (f32 8, bf16 16, i8 32)."""
    return 8 * 4 // itemsize


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def _window_extents(xc, Y, zc, kernel_spatial, pads_lo, m):
    """((x-window extents), (g-window extents)) per spatial dim — x
    extends high by k-1-lo, g by lo; z extents tile-rounded."""
    kx, ky, kz = kernel_spatial
    xl, yl, zl = pads_lo
    x_ext = (xc + kx - 1 - xl, Y + ky - 1 - yl,
             _round_up(zc + kz - 1 - zl, m))
    g_ext = (xc + xl, Y + yl, _round_up(zc + zl, m))
    return x_ext, g_ext


def _pick_chunks(X, Y, Z, kernel_spatial, pads_lo, ci_t, co_t, itemsize):
    """(xc, zc): x- and z-chunk sizes.

    z chunks must be sublane-tile-aligned (or Z itself) — Mosaic's
    second-minor block rule; x is a major dim, so any divisor of X
    works. Walks (zc desc, xc desc) and returns the first combination
    whose grid-step VMEM footprint (3x each input window: double
    buffering + the masked VMEM copy, plus the resident out block) fits
    the budget; falls back to the smallest.
    """
    kx, ky, kz = kernel_spatial
    m = _sublane_tile(itemsize)
    z_cands = [Z] + [d for d in range(Z - m, 0, -m) if Z % d == 0]
    out_bytes = kx * ky * kz * ci_t * co_t * 4
    best = None
    for zc in z_cands:
        for xc in _divisors_desc(X):
            x_ext, g_ext = _window_extents(xc, Y, zc, kernel_spatial,
                                           pads_lo, m)
            x_bytes = int(np.prod(x_ext)) * ci_t * itemsize
            g_bytes = int(np.prod(g_ext)) * co_t * itemsize
            total = 3 * x_bytes + 3 * g_bytes + out_bytes
            best = (xc, zc)
            if total <= _VMEM_BUDGET:
                return best
    return best


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
    (xl, xh), (yl, yh), (zl, zh) = pads

    ci_t = min(Ci, LANES)
    co_t = min(Co, LANES)
    item = max(x.dtype.itemsize, g.dtype.itemsize)
    m = _sublane_tile(item)
    xc, zc = _pick_chunks(X, Y, Z, kernel_spatial, (xl, yl, zl),
                          ci_t, co_t, item)
    grid = (Ci // ci_t, Co // co_t, B, Z // zc, X // xc)
    x_ext, g_ext = _window_extents(xc, Y, zc, kernel_spatial,
                                   (xl, yl, zl), m)

    def hi_pad(ext, chunk, n_chunks, dim):
        # declared high-OOB extent so the LAST chunk's window stays in
        # the (virtually padded) array; content undefined, masked in
        # the kernel — only the extent matters
        return max((n_chunks - 1) * chunk + ext - dim, 0)

    def window_spec(ext, tile, is_x):
        xe, ye, ze = ext
        pad = (hi_pad(xe, xc, X // xc, X), hi_pad(ye, Y, 1, Y),
               hi_pad(ze, zc, Z // zc, Z))

        def index(ci, co, b, z, xi):
            return (b, xi * xc, 0, z * zc, (ci if is_x else co) * tile)

        return pl.BlockSpec(
            # Mosaic: a buffer with ANY Element dim must be all Element
            # (Squeezed allowed); index_map entries are ELEMENT offsets,
            # and only HIGH declared padding is supported
            (None, pl.Element(xe, (0, pad[0])), pl.Element(ye, (0, pad[1])),
             pl.Element(ze, (0, pad[2])), pl.Element(tile)),
            index)

    kkk = kx * ky * kz
    out = pl.pallas_call(
        partial(_dw_kernel, kernel_spatial=kernel_spatial,
                chunks=(xc, Y, zc), valid_extents=(X, Y, Z),
                pads_lo=(xl, yl, zl)),
        grid=grid,
        in_specs=[window_spec(x_ext, ci_t, True),
                  window_spec(g_ext, co_t, False)],
        out_specs=pl.BlockSpec(
            (kkk, ci_t, co_t), lambda ci, co, b, z, xi: (0, ci, co)),
        out_shape=jax.ShapeDtypeStruct((kkk, Ci, Co), jnp.float32),
        interpret=interpret,
    )(x, g)
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
    if (dw_conv_supported(x.shape, g.shape, kernel_spatial, tuple(pads))
            and int(np.prod(kernel_spatial)) <= _PERF_SCOPE_KKK):
        dw = dw_conv_pallas(x, g, kernel_spatial, tuple(pads))
    else:
        dw = _dw_xla(x, g, tuple(pads), rank)
    return dx, dw.astype(w.dtype)


conv_pallas_dw.defvjp(_fwd, _bwd)
