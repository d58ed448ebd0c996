"""Custom-VJP BatchNorm with (optionally Pallas) statistic reductions.

Measured outcome on v5e (BENCHMARKS.md "BN statistics"): for the V-Net,
XLA already fuses the forward moments INTO the producing convolution's
kOutput fusion (conv + epilogue + both reductions in one pass at MXU
roofline), so forcing the reductions through Pallas kernels breaks that
fusion and is ~14% slower end-to-end; with ``STATS_IMPL="xla"`` this
custom-VJP is performance-neutral vs autodiff. It is therefore NOT used
by the model zoo's norm layers — it exists for norm sites whose producer
is not a convolution (where the streaming kernels in ``fused.py`` win)
and as the measured record of the experiment.

Semantics are EXACT train-mode BatchNorm (biased variance, f32
statistics); equivalence to autodiff is covered by tests/test_pallas_bn.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused import bn_grad_stats, bn_stats

# "xla" (default; lets XLA fuse the reductions with their producer) or
# "pallas" (streaming kernels from fused.py — use when the producer is
# not a convolution and XLA's layout choice defeats the reduce).
STATS_IMPL = "xla"


def stats_impl() -> str:
    if STATS_IMPL != "auto":
        return STATS_IMPL
    from . import is_tpu_backend
    return "pallas" if is_tpu_backend() else "xla"


def _moments(x, groups: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-base-channel (mean, E[x^2]) in f32, reducing over batch, spatial
    AND the ``groups`` offset blocks of a packed layout (channels =
    groups * C, offset-major)."""
    cp = x.shape[-1]
    c = cp // groups
    n = x.size // c
    if stats_impl() == "pallas":
        s, sq = bn_stats(x)
    else:
        xf = x.reshape(-1, cp).astype(jnp.float32)
        s = jnp.sum(xf, axis=0)
        sq = jnp.sum(xf * xf, axis=0)
    if groups > 1:
        s = s.reshape(groups, c).sum(axis=0)
        sq = sq.reshape(groups, c).sum(axis=0)
    return s / n, sq / n


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def batch_norm_train(x, scale, bias, _unused, groups: int = 1,
                     eps: float = 1e-3):
    """Train-mode BatchNorm over a (possibly packed) channels-last tensor.

    Args:
      x: ``(..., groups*C)`` activations (any float dtype).
      scale, bias: ``(C,)`` parameters.
      _unused: placeholder so fwd/bwd share a signature (pass 0.0).
    Returns:
      ``(y, mean, var)`` — y in x.dtype; mean/var f32 ``(C,)`` (for the
      EMA update done by the caller).
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, groups, eps)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, groups, eps):
    c = scale.shape[0]
    mean, meansq = _moments(x, groups)
    var = meansq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale.astype(jnp.float32))
    b = (bias.astype(jnp.float32) - mean * a)
    at = jnp.tile(a, groups).astype(x.dtype)
    bt = jnp.tile(b, groups).astype(x.dtype)
    y = x * at + bt
    return y, mean, var, inv


def _bn_fwd(x, scale, bias, _unused, groups, eps):
    y, mean, var, inv = _bn_fwd_impl(x, scale, bias, groups, eps)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd(groups, eps, res, cts):
    x, scale, mean, inv = res
    dy, dmean_ct, dvar_ct = cts
    c = scale.shape[0]
    n = x.size // c

    meant = jnp.tile(mean, groups)
    invt = jnp.tile(inv, groups)
    if stats_impl() == "pallas":
        sum_dy_p, sum_dy_xhat_p = bn_grad_stats(dy, x, meant, invt)
    else:
        dyf = dy.reshape(-1, groups * c).astype(jnp.float32)
        xf = x.reshape(-1, groups * c).astype(jnp.float32)
        xhat = (xf - meant) * invt
        sum_dy_p = jnp.sum(dyf, axis=0)
        sum_dy_xhat_p = jnp.sum(dyf * xhat, axis=0)
    sum_dy = sum_dy_p.reshape(groups, c).sum(0) if groups > 1 else sum_dy_p
    sum_dy_xhat = (sum_dy_xhat_p.reshape(groups, c).sum(0)
                   if groups > 1 else sum_dy_xhat_p)

    scale_f = scale.astype(jnp.float32)
    dscale = sum_dy_xhat
    dbias = sum_dy

    # dx of y = (x - mean(x)) * rsqrt(var(x)+eps) * scale + bias (biased
    # variance), plus the direct cotangents on the (mean, var) outputs
    # (the EMA branch — zeros in training, kept for custom_vjp totality):
    #   dx = inv*scale * (dy - sum_dy/n - xhat * sum_dy_xhat/n)
    #      + dmean_ct/n + dvar_ct * 2*(x - mean)/n
    c1 = jnp.tile(inv * scale_f, groups)
    m_dy = jnp.tile(sum_dy, groups) / n
    m_dyx = jnp.tile(sum_dy_xhat, groups) / n
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xhat = (xf - meant) * invt
    dx = c1 * (dyf - m_dy - xhat * m_dyx)
    dx = dx + jnp.tile(dmean_ct, groups) / n
    dx = dx + jnp.tile(dvar_ct, groups) * 2.0 * (xf - meant) / n
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype), None)


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
