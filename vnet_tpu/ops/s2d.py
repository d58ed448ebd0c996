"""Space-to-depth packed convolution — the TPU layout trick for
small-channel volumetric convs.

The V-Net's hot convolutions have 16-32 channels at high resolution
(`networks.py:307-322`): on TPU the MXU contracts over channel blocks of
128, so a 16-channel conv wastes ~90% of the systolic array (measured ~1.3
TFLOP/s vs ~200 peak on v5e). Packing a factor-2 space-to-depth transform
into the layer — x (D,H,W,C) -> (D/2,H/2,W/2,8C) — turns the same math
into an MXU-dense conv:

    conv_{5x5x5, C->C, SAME}(x)  ==  depth_to_space(
        conv_{3x3x3, 8C->8C, SAME}(space_to_depth(x), packed_kernel))

with ``packed_kernel`` a sparse re-arrangement of the original 5^3 kernel
(zeros where a tap falls outside the 5^3 support). FLOPs grow by
27*64/(125*8) = 1.73x but utilization grows ~8x. The transform is exact
(validated to fp tolerance in tests/test_s2d.py) so checkpoints and
behavior are unchanged.

Works for any odd kernel size k on even-sized inputs; the packed kernel is
ceil((k+1)/2)+... computed below (k=5 -> 3, k=3 -> 2? no: k=3 -> taps
dx+u in [-1,2] -> a in {-1,0,1} -> 3). General packed size = number of
distinct floor((d+u)/2) for u in [-(k//2), k//2], d in {0,1}.

Per-axis packing (``factors``): every function takes an optional tuple of
per-axis factors (1 = leave the axis unpacked, 2 = pack it); ``None``
means pack all axes (the historical behavior). Deeper V-Net levels only
need enough packing to fill the MXU's 128 lanes, and each unpacked axis
cuts the packing FLOP tax: at k=5, full 3D packing costs 1.728x the
original FLOPs, (2,2,1) costs 1.44x, (2,1,1) costs 1.20x (measured
1.14x/1.30x faster per fwd+bwd conv at L2/L3 shapes on v5e — BENCHMARKS
exp9). The transform stays exact for every factor combination.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _norm_factors(factors, rank: int) -> Tuple[int, ...]:
    if factors is None:
        return (2,) * rank
    factors = tuple(int(f) for f in factors)
    assert len(factors) == rank and all(f in (1, 2) for f in factors), factors
    return factors


def prod_factors(factors) -> int:
    g = 1
    for f in factors:
        g *= f
    return g


def space_to_depth(x: jnp.ndarray, factor: int = 2,
                   factors=None) -> jnp.ndarray:
    """(B, *spatial, C) -> (B, *spatial/f, prod(factors) * C).

    Channel layout: offset-major — packed channel = offset_index * C + c
    where offset_index enumerates the packed-axis sub-grid offsets in
    lexicographic (axis-order) order. ``factors`` selects per-axis packing
    (1 = skip the axis); default packs every axis by ``factor``.
    """
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    rank = len(spatial)
    if factors is None:
        factors = (factor,) * rank
    factors = _norm_factors(factors, rank)
    if all(f == 1 for f in factors):
        return x
    # reshape each packed spatial dim s -> (s/f, f)
    new_shape = (b,)
    off_dims = []  # positions of the per-axis offset dims in new_shape
    pos = 1
    for s, f in zip(spatial, factors):
        assert s % f == 0, f"spatial dim {s} not divisible by {f}"
        if f == 1:
            new_shape += (s,)
            pos += 1
        else:
            new_shape += (s // f, f)
            off_dims.append(pos + 1)
            pos += 2
    new_shape += (c,)
    y = x.reshape(new_shape)
    # move the f-dims next to channels, preserving axis order
    spatial_dims = [d for d in range(1, pos) if d not in off_dims]
    perm = [0] + spatial_dims + off_dims + [pos]
    y = jnp.transpose(y, perm)
    out_spatial = tuple(s // f for s, f in zip(spatial, factors))
    return y.reshape((b,) + out_spatial + (prod_factors(factors) * c,))


def depth_to_space(x: jnp.ndarray, factor: int = 2,
                   factors=None) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b = x.shape[0]
    spatial = x.shape[1:-1]
    rank = len(spatial)
    if factors is None:
        factors = (factor,) * rank
    factors = _norm_factors(factors, rank)
    g = prod_factors(factors)
    if g == 1:
        return x
    c = x.shape[-1] // g
    packed_axes = [i for i, f in enumerate(factors) if f == 2]
    y = x.reshape((b,) + spatial + (2,) * len(packed_axes) + (c,))
    # interleave back: each packed axis gets its offset dim to its right
    perm = [0]
    for i in range(rank):
        perm.append(1 + i)
        if i in packed_axes:
            perm.append(1 + rank + packed_axes.index(i))
    perm.append(1 + rank + len(packed_axes))
    y = jnp.transpose(y, perm)
    return y.reshape(
        (b,) + tuple(s * f for s, f in zip(spatial, factors)) + (c,))


@lru_cache(maxsize=None)
def _packing_plan(k: int, factor: int = 2) -> Tuple[int, int, tuple]:
    """Per-axis plan for one spatial axis.

    Returns (kp, a_min, entries) — packed kernel extent, the tap shift,
    and (packed_tap a-a_min, in_offset e, out_offset d, orig_tap u+k//2)
    tuples. ``factor == 1`` is the identity plan (axis left unpacked)."""
    h = k // 2
    if factor == 1:
        entries = tuple((u + h, 0, 0, u + h) for u in range(-h, h + 1))
        return k, -h, entries
    entries = []
    a_vals = set()
    for d in (0, 1):
        for u in range(-h, h + 1):
            a, e = divmod(d + u, 2)
            a_vals.add(a)
            entries.append((a, e, d, u + h))
    a_min, a_max = min(a_vals), max(a_vals)
    kp = a_max - a_min + 1
    # shift packed taps to start at 0
    entries = tuple((a - a_min, e, d, t) for a, e, d, t in entries)
    return kp, a_min, entries


@lru_cache(maxsize=None)
def _pack_maps(k: int, rank: int,
               factors=None) -> Tuple[tuple, np.ndarray, np.ndarray]:
    """Constant gather map for :func:`pack_kernel`.

    Returns (kp_per_axis, tap_index, mask); the arrays are shaped
    (prod(kp), G, G) with G = prod(factors): for packed tap position a,
    input sub-grid offset e, output sub-grid offset d — the flat original
    tap index (or 0) and its validity. Offsets are mixed-radix over the
    packed axes in axis order (matching :func:`space_to_depth`)."""
    import itertools

    factors = _norm_factors(factors, rank)
    plans = [_packing_plan(k, f) for f in factors]
    kps = tuple(p[0] for p in plans)
    n_off = prod_factors(factors)
    n_a = int(np.prod(kps))
    tap_index = np.zeros((n_a, n_off, n_off), np.int32)
    mask = np.zeros((n_a, n_off, n_off), bool)

    def idx_of(offs):
        v = 0
        for o, f in zip(offs, factors):
            v = v * f + o
        return v

    for axis_entries in itertools.product(
            *[p[2] for p in plans]):
        a = tuple(e[0] for e in axis_entries)
        e_off = tuple(e[1] for e in axis_entries)
        d_off = tuple(e[2] for e in axis_entries)
        taps = tuple(e[3] for e in axis_entries)
        a_flat = 0
        t_flat = 0
        for ai, kpi, ti in zip(a, kps, taps):
            a_flat = a_flat * kpi + ai
            t_flat = t_flat * k + ti
        tap_index[a_flat, idx_of(e_off), idx_of(d_off)] = t_flat
        mask[a_flat, idx_of(e_off), idx_of(d_off)] = True
    return kps, tap_index, mask


def pack_kernel(kernel: jnp.ndarray, factor: int = 2,
                input_splits=None, factors=None) -> jnp.ndarray:
    """(k,...,k, Cin, Cout) -> packed (kp...,  G*Cin, G*Cout) kernel,
    G = prod(factors); per-axis kp = 3 for k=5 on packed axes, k on
    unpacked axes.

    Channel layout matches :func:`space_to_depth` (offset-major).
    Differentiable: implemented as a constant-index gather + mask.

    ``input_splits=(C1, C2, ...)`` with ``sum == Cin``: the packed input is
    a FLAT channel concatenation of separately-packed tensors (offset-major
    within each block) — e.g. the decoder's ``concat([up, skip])``
    (`networks.py:330`) done directly on packed tensors with no
    re-interleaving reshape. The kernel rows are permuted to match.
    """
    assert factor == 2, "only factor 2 implemented"
    rank = kernel.ndim - 2
    k = kernel.shape[0]
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    factors = _norm_factors(factors, rank)
    n_off = prod_factors(factors)

    kps, tap_index, mask = _pack_maps(k, rank, factors)
    n_a = int(np.prod(kps))
    taps = kernel.reshape(k ** rank, cin, cout)
    # (prod(kp), E, D, cin, cout)
    gathered = taps[tap_index]
    gathered = jnp.where(jnp.asarray(mask)[..., None, None], gathered, 0)
    # -> (prod(kp), E, cin, D, cout)
    packed = jnp.transpose(gathered, (0, 1, 3, 2, 4))
    if input_splits is not None:
        assert sum(input_splits) == cin, (input_splits, cin)
        # row order [(block, e, c_in_block)] instead of [(e, c)]
        blocks = []
        off = 0
        for cb in input_splits:
            blk = packed[:, :, off:off + cb]  # (a, E, cb, D, cout)
            blocks.append(blk.reshape(n_a, n_off * cb, n_off, cout))
            off += cb
        packed = jnp.concatenate(blocks, axis=1)
        packed = packed.reshape(kps + (n_off * cin, n_off * cout))
        return packed.astype(kernel.dtype)
    packed = packed.reshape(kps + (n_off * cin, n_off * cout))
    return packed.astype(kernel.dtype)


def packed_pads(k: int, factors) -> list:
    """Per-axis (lo, hi) SAME padding in the packed domain."""
    pads = []
    for f in factors:
        kp, a_min, _ = _packing_plan(k, f)
        pads.append((-a_min, a_min + kp - 1))
    return pads


def packed_conv(xp: jnp.ndarray, kernel: jnp.ndarray,
                preferred_element_type=None, halo=None,
                input_splits=None, factors=None,
                dw_impl: str = "xla") -> jnp.ndarray:
    """Conv on an ALREADY-packed tensor: ``s2d(conv(d2s(xp), kernel))``
    without the transposes. ``xp`` is ``(B, *spatial/f, G * Cin)``
    offset-major; ``kernel`` the original ``(k..., Cin, Cout)``.

    ``halo=(axis_name, spatial_axis)``: the packed tensor is a local shard
    along ``spatial_axis`` inside ``shard_map`` — exchange neighbor slabs
    in the packed domain and convolve VALID there (see
    `vnet_tpu/parallel/spatial.py`).

    ``input_splits``: ``xp`` is a flat channel concat of separately-packed
    tensors — see :func:`pack_kernel`.

    ``dw_impl``: weight-gradient formulation — "custom" routes through
    :func:`vnet_tpu.ops.conv_vjp.conv_custom_dw` (explicit dot dW),
    "pallas" through :func:`vnet_tpu.ops.pallas.dw_conv.conv_pallas_dw`
    (VMEM-transposing hand kernel for the lane-aligned hot convs, XLA
    fallback out of scope). Identical math; only honored when no
    ``preferred_element_type`` is requested.
    """
    rank = kernel.ndim - 2
    k = kernel.shape[0]
    assert k % 2 == 1
    factors = _norm_factors(factors, rank)
    packed = pack_kernel(kernel, input_splits=input_splits, factors=factors)
    pads = packed_pads(k, factors)
    if halo is not None:
        from ..parallel.spatial import halo_exchange_asym
        axis_name, sp_axis = halo
        lo, hi = pads[sp_axis]
        xp = halo_exchange_asym(xp, lo, hi, axis_name, 1 + sp_axis)
        pads[sp_axis] = (0, 0)
    if dw_impl == "pallas" and preferred_element_type is None:
        from .pallas.dw_conv import conv_pallas_dw
        return conv_pallas_dw(xp, packed, tuple(pads)).astype(xp.dtype)
    if dw_impl == "custom" and preferred_element_type is None:
        from .conv_vjp import conv_custom_dw
        return conv_custom_dw(xp, packed, tuple(pads)).astype(xp.dtype)
    return jax.lax.conv_general_dilated(
        xp, packed, (1,) * rank, pads,
        dimension_numbers=_dim_numbers(rank),
        preferred_element_type=preferred_element_type).astype(xp.dtype)


def packed_down_conv(xp: jnp.ndarray, kernel: jnp.ndarray,
                     keep_packed: bool = False,
                     factors=None) -> jnp.ndarray:
    """Down-convolution consuming a packed input directly: the stride-2
    2^r conv is one matmul over the packed channels; output is UNPACKED on
    the half-resolution grid.

    ``factors``: the input's per-axis packing. Axes packed with factor 1
    are completed to full 2^r packing first (a narrow transpose), then the
    matmul's kernel rows are permuted to the (e_unpacked, e_packed, cin)
    channel order that completion produces.

    ``keep_packed=True`` (full factors only) emits the NEXT level's packed
    layout instead: each stride-2 output voxel is one packed input voxel,
    so packing the half-res output = space-to-depth of ``xp`` itself
    followed by the same matmul applied per offset group.
    """
    rank = kernel.ndim - 2
    assert all(kernel.shape[i] == 2 for i in range(rank))
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    factors = _norm_factors(factors, rank)
    if any(f == 1 for f in factors):
        assert not keep_packed
        # complete the packing on the unpacked axes; their offsets land
        # channel-major, so permute the kernel's tap axes to match
        comp = tuple(2 if f == 1 else 1 for f in factors)
        xp = space_to_depth(xp, factors=comp)
        u_axes = [i for i, f in enumerate(factors) if f == 1]
        p_axes = [i for i, f in enumerate(factors) if f == 2]
        kernel = jnp.transpose(kernel, u_axes + p_axes + [rank, rank + 1])
    K = kernel.reshape(2 ** rank * cin, cout)
    if not keep_packed:
        return jnp.einsum("...i,io->...o", xp, K).astype(xp.dtype)
    groups = 2 ** rank
    xp2 = space_to_depth(xp)  # (B, s/4, groups * (groups*cin))
    xg = xp2.reshape(xp2.shape[:-1] + (groups, groups * cin))
    y = jnp.einsum("...ge,eo->...go", xg, K)
    # packed channel = g * cout + o — offset-major, the next level's layout
    return y.astype(xp.dtype).reshape(xp2.shape[:-1] + (groups * cout,))


def s2d_down_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 2^r conv == a dense matmul on the space-to-depth grid.

    ``lax.conv(x, k, strides=2, SAME)`` with a 2^r kernel touches each input
    voxel exactly once: output voxel i reads input block 2i+offsets — which
    is precisely one packed voxel. So the whole down-convolution
    (`layers2.py:78-84`) is ``s2d(x) @ K`` with
    ``K[(e, cin), cout] = kernel[e..., cin, cout]`` — MXU-dense regardless
    of the original channel count.
    """
    rank = kernel.ndim - 2
    assert all(kernel.shape[i] == 2 for i in range(rank))
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    xp = space_to_depth(x)
    # kernel (2,..,2, cin, cout) -> ((e, cin), cout); e lexicographic matches
    # space_to_depth's offset-major channel layout.
    K = kernel.reshape(2 ** rank * cin, cout)
    y = jnp.einsum("...i,io->...o", xp, K)
    return y.astype(x.dtype)


def s2d_up_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                keep_packed: bool = False,
                out_factors=None) -> jnp.ndarray:
    """Stride-2 2^r transpose conv == matmul + depth-to-space.

    ``lax.conv_transpose(x, k, strides=2, SAME)`` writes each output voxel
    ``2i + d`` from exactly one input voxel ``i`` with tap ``k[d]``:
    ``y = d2s(x @ K)`` with ``K[cin, (d, cout)] = kernel[d..., cin, cout]``
    (`layers2.py:88-94` semantics).

    ``keep_packed=True``: return the output in its packed layout instead
    of interleaving; ``out_factors`` selects WHICH axes stay packed
    (default: all). The kernel's tap axes are ordered
    (d_unpacked, d_packed, cout) so the partial depth-to-space leaves
    exactly the target offset-major channels.
    """
    rank = kernel.ndim - 2
    assert all(kernel.shape[i] == 2 for i in range(rank))
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    # conv_transpose writes the FLIPPED kernel: y[2i+d] = k[1-d] * x[i]
    kernel = jnp.flip(kernel, axis=tuple(range(rank)))
    if keep_packed and out_factors is not None:
        out_factors = _norm_factors(out_factors, rank)
        if any(f == 1 for f in out_factors):
            u_axes = [i for i, f in enumerate(out_factors) if f == 1]
            p_axes = [i for i, f in enumerate(out_factors) if f == 2]
            # columns (d_u, d_p, cout): partial d2s consumes d_u spatially
            kernel = jnp.transpose(kernel,
                                   u_axes + p_axes + [rank, rank + 1])
            K = jnp.moveaxis(kernel.reshape(2 ** rank, cin, cout), 1, 0)
            K = K.reshape(cin, 2 ** rank * cout)
            y = jnp.einsum("...i,io->...o", x, K).astype(x.dtype)
            comp = tuple(2 if f == 1 else 1 for f in out_factors)
            return depth_to_space(y, factors=comp)
    # (2,..,2, cin, cout) -> (cin, (d, cout))
    K = jnp.moveaxis(kernel.reshape(2 ** rank, cin, cout), 1, 0)
    K = K.reshape(cin, 2 ** rank * cout)
    y = jnp.einsum("...i,io->...o", x, K).astype(x.dtype)
    if keep_packed:
        # offset-major packed layout on the pre-upsample grid — exactly
        # space_to_depth(depth_to_space(y)); consumers in the packed
        # domain skip both transposes
        return y
    return depth_to_space(y)


def _dim_numbers(rank: int):
    if rank == 2:
        return ("NHWC", "HWIO", "NHWC")
    if rank == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"rank {rank}")


def s2d_conv(x: jnp.ndarray, kernel: jnp.ndarray,
             preferred_element_type=None, halo=None) -> jnp.ndarray:
    """SAME stride-1 conv computed in the space-to-depth domain.

    Exactly equals ``lax.conv_general_dilated(x, kernel, 1, "SAME")`` for
    odd kernels on even-sized inputs. ``halo``: see :func:`packed_conv`.
    """
    rank = kernel.ndim - 2
    k = kernel.shape[0]
    assert k % 2 == 1, "odd kernels only"
    xp = space_to_depth(x)
    yp = packed_conv(xp, kernel,
                     preferred_element_type=preferred_element_type,
                     halo=halo)
    return depth_to_space(yp.astype(x.dtype))
