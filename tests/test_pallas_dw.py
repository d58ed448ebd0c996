"""Pallas dW kernel tests (vnet_tpu/ops/pallas/dw_conv.py).

CPU interpreter mode (tests/conftest.py forces the CPU backend, the
kernel auto-selects the interpreter there); on TPU the same code
compiles to Mosaic and is numerics-validated by the on-chip A/B harness
(scripts/experiments/ab_train.py pdw_* variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.conv_vjp import same_pads
from vnet_tpu.ops.pallas.dw_conv import (_dw_xla, conv_pallas_dw,
                                         dw_conv_pallas, dw_conv_supported)


@pytest.mark.parametrize("shape,k,dtype", [
    ((2, 8, 8, 8, 128, 128), 3, jnp.float32),   # single ci/co tile
    ((2, 8, 8, 4, 256, 128), 3, jnp.float32),   # two ci tiles
    ((1, 8, 8, 8, 128, 256), 5, jnp.float32),   # two co tiles, 5^3 kernel
    # VMEM budget forces z-chunking (zc=8 < Z=32 under the sublane-
    # aligned candidate rule) + tile-rounding tail on the last chunk
    ((1, 32, 32, 32, 128, 128), 3, jnp.float32),
    # bf16 = the training dtype: sublane tile 16, zb rounds 18 -> 32
    ((2, 8, 8, 16, 128, 128), 3, jnp.bfloat16),
])
def test_dw_kernel_matches_xla(rng, shape, k, dtype):
    B, X, Y, Z, Ci, Co = shape
    x = jnp.asarray(rng.normal(size=(B, X, Y, Z, Ci)).astype(np.float32),
                    dtype)
    g = jnp.asarray(rng.normal(size=(B, X, Y, Z, Co)).astype(np.float32),
                    dtype)
    pads = same_pads((k,) * 3)
    assert dw_conv_supported(x.shape, g.shape, (k,) * 3, pads)
    got = dw_conv_pallas(x, g, (k,) * 3, pads)
    ref = _dw_xla(x, g, pads, 3)
    # f32: accumulation-order noise over the X*Y*Z contraction (measured
    # max abs 4.6e-4 on O(100) values at the 32^3 case); bf16 inputs wider
    tol = dict(rtol=1e-4, atol=1e-3) if dtype == jnp.float32 \
        else dict(rtol=3e-2, atol=3e-1)
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(ref).astype(np.float32), **tol)


def test_conv_pallas_dw_full_vjp_matches_stock(rng):
    """Forward AND both gradients equal the stock conv's autodiff."""
    B, X, Y, Z, Ci, Co, k = 2, 8, 8, 8, 128, 128, 3
    x = jnp.asarray(rng.normal(size=(B, X, Y, Z, Ci)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(k, k, k, Ci, Co)).astype(np.float32) * 0.05)
    pads = same_pads((k,) * 3)

    def stock(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,) * 3, pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def ours(x, w):
        return conv_pallas_dw(x, w, pads)

    y_ref, y = stock(x, w), ours(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    dx_ref, dw_ref = jax.vjp(stock, x, w)[1](ct)
    dx, dw = jax.vjp(ours, x, w)[1](ct)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-5, atol=2e-4)


def test_conv_pallas_dw_out_of_scope_falls_back(rng):
    """Non-lane-aligned channels: the VJP silently uses the XLA dW."""
    B, S, Ci, Co, k = 1, 6, 8, 8, 3
    x = jnp.asarray(rng.normal(size=(B, S, S, S, Ci)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(k, k, k, Ci, Co)).astype(np.float32) * 0.1)
    pads = same_pads((k,) * 3)
    assert not dw_conv_supported(x.shape, (B, S, S, S, Co), (k,) * 3, pads)

    def stock(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,) * 3, pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    ct = jnp.ones((B, S, S, S, Co), jnp.float32)
    dx_ref, dw_ref = jax.vjp(stock, x, w)[1](ct)
    dx, dw = jax.vjp(lambda x, w: conv_pallas_dw(x, w, pads), x, w)[1](ct)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_dw_impl_equivalent(rng):
    """dw_impl='pallas' is an exact rewrite at the packed_conv surface:
    same forward, same gradients (the conv_impl-invariance contract,
    CLAUDE.md architecture invariants)."""
    from vnet_tpu.ops.s2d import packed_conv, space_to_depth

    B, S, C, k = 1, 8, 16, 3
    x = jnp.asarray(rng.normal(size=(B, S, S, S, C)).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(k, k, k, C, C)).astype(np.float32) * 0.1)
    xp = space_to_depth(x)  # (B, 4,4,4, 128) — lane-aligned

    def f(impl):
        def run(xp, kern):
            return jnp.sum(packed_conv(xp, kern, dw_impl=impl) ** 2)
        val, grads = jax.value_and_grad(run, argnums=(0, 1))(xp, kern)
        return val, grads

    v_ref, (dxp_ref, dk_ref) = f("xla")
    v, (dxp, dk) = f("pallas")
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxp_ref),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-5, atol=2e-4)
