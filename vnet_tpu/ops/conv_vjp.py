"""Stride-1 convolution with an explicitly-formulated weight-gradient.

XLA's conv_backprop_filter chooses its own layout for the (large)
activation operand; at the V-Net's packed L1/L2 convs that choice
disagrees with the forward conv's layout and costs ~31 ms/step in
{4,0,3,2,1} <-> {0,4,3,2,1} copy pairs (BENCHMARKS.md "Roofline";
reference hot loop: `/root/reference/networks.py:307-322`).

:func:`conv_custom_dw` is numerically identical to
``lax.conv_general_dilated`` (same forward, autodiff-equal gradients —
tests/test_conv_vjp.py) but computes dW itself as

    dW[k..., ci, co] = sum_{b, p} x[b, p + k - pad, ci] * dy[b, p, co]

expressed as one ``conv_general_dilated`` whose dimension numbers put the
channels-last activation in the conv-"N" role per channel (lhs spec
``CDHWN``: Ci is batch, B is the contracted feature), dy as the kernel
(``IDHWO``: B contracted, Co output), and the output DIRECTLY in kernel
layout (``DHWNC``) — no transposes on either operand or result, so XLA's
layout assignment sees a copy-free problem.

Scope: stride 1, no dilation, channels-last (NHWC / NDHWC), symmetric or
asymmetric explicit padding. The V-Net's hot convs (packed 3^r and direct
5^r SAME) are all in scope; strided down/up convs keep XLA's autodiff.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from functools import partial

_SPECS = {
    2: dict(fwd=("NHWC", "HWIO", "NHWC"),
            dw=("CHWN", "IHWO", "HWNC")),
    3: dict(fwd=("NDHWC", "DHWIO", "NDHWC"),
            dw=("CDHWN", "IDHWO", "DHWNC")),
}


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_custom_dw(x: jnp.ndarray, w: jnp.ndarray,
                   pads: Tuple[Tuple[int, int], ...]) -> jnp.ndarray:
    """``lax.conv_general_dilated(x, w, 1, pads)`` (channels-last) with a
    custom-vjp dW; see module docstring. ``pads`` must be a tuple of
    per-axis ``(lo, hi)`` pairs (hashable: it is a nondiff argument)."""
    rank = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x, w, (1,) * rank, pads, dimension_numbers=_SPECS[rank]["fwd"])


def _fwd(x, w, pads):
    return conv_custom_dw(x, w, pads), (x, w)


def _bwd(pads, res, g):
    x, w = res
    rank = x.ndim - 2
    spec = _SPECS[rank]
    # dx: XLA's standard transposed conv (its layout is already fine)
    _, vjp_x = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, w, (1,) * rank, pads, dimension_numbers=spec["fwd"]), x)
    (dx,) = vjp_x(g)
    dw = jax.lax.conv_general_dilated(
        x, g, (1,) * rank, pads, dimension_numbers=spec["dw"])
    return dx, dw.astype(w.dtype)


conv_custom_dw.defvjp(_fwd, _bwd)


def same_pads(kernel_spatial: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """Explicit SAME padding for stride 1: ((k-1)//2, k//2) per axis."""
    return tuple(((k - 1) // 2, k // 2) for k in kernel_spatial)
