"""Space-to-depth conv equivalence tests (vnet_tpu/ops/s2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.s2d import (depth_to_space, pack_kernel, s2d_conv,
                              space_to_depth)


def direct_conv(x, k):
    rank = k.ndim - 2
    dims = ("NHWC", "HWIO", "NHWC") if rank == 2 else ("NDHWC", "DHWIO", "NDHWC")
    return jax.lax.conv_general_dilated(x, k, (1,) * rank, "SAME",
                                        dimension_numbers=dims)


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32))
    y = space_to_depth(x)
    assert y.shape == (2, 4, 4, 4, 24)
    np.testing.assert_allclose(np.asarray(depth_to_space(y)), np.asarray(x))


def test_space_to_depth_layout(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    y = space_to_depth(x)
    # packed channel = offset_index * C + c, offsets lexicographic (dz last
    # spatial axis fastest): offset (0,0,1) -> index 1
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, 0, 2 * 1:2 * 2]),
                               np.asarray(x[0, 0, 0, 1, :]))
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, 0, 2 * 4:2 * 5]),
                               np.asarray(x[0, 1, 0, 0, :]))


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("rank", [2, 3])
def test_s2d_conv_equals_direct(rng, k, rank):
    spatial = (8,) * rank
    cin, cout = 3, 4
    x = jnp.asarray(rng.normal(size=(2, *spatial, cin)).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(k,) * rank + (cin, cout)).astype(np.float32) * 0.2)
    got = s2d_conv(x, kern)
    expected = direct_conv(x, kern)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4)


def test_s2d_conv_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(5, 5, 5, 2, 2)).astype(np.float32) * 0.2)

    g1 = jax.grad(lambda k: jnp.sum(s2d_conv(x, k) ** 2))(kern)
    g2 = jax.grad(lambda k: jnp.sum(direct_conv(x, k) ** 2))(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)

    gx1 = jax.grad(lambda xx: jnp.sum(s2d_conv(xx, kern) ** 2))(x)
    gx2 = jax.grad(lambda xx: jnp.sum(direct_conv(xx, kern) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-3)


def test_packed_down_conv_keep_packed():
    # keep_packed=True emits the next level's offset-major packed layout:
    # d2s(unflatten) of it equals the plain packed_down_conv output
    from vnet_tpu.ops.s2d import (depth_to_space, packed_down_conv,
                                  space_to_depth)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 4, 8)).astype(np.float32))
    xp = space_to_depth(x)
    plain = packed_down_conv(xp, k)                      # (2,4,4,4,8)
    packed = packed_down_conv(xp, k, keep_packed=True)   # (2,2,2,2,64)
    np.testing.assert_allclose(np.asarray(depth_to_space(packed)),
                               np.asarray(plain), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("factors", [(2, 1, 1), (2, 2, 1), (1, 2, 1),
                                     (1, 1, 1)])
def test_partial_factors_conv_equals_direct(rng, factors):
    # per-axis packing (deep-level FLOP-tax reduction) is an exact rewrite
    from vnet_tpu.ops.s2d import packed_conv
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 4, 3)).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(5, 5, 5, 3, 4)).astype(np.float32) * 0.2)
    xp = space_to_depth(x, factors=factors)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(xp, factors=factors)), np.asarray(x))
    got = depth_to_space(packed_conv(xp, kern, factors=factors),
                         factors=factors)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(direct_conv(x, kern)), atol=1e-4)


def test_partial_factors_gradients_match(rng):
    from vnet_tpu.ops.s2d import packed_conv
    factors = (2, 1, 1)
    x = jnp.asarray(rng.normal(size=(1, 8, 6, 4, 2)).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(5, 5, 5, 2, 2)).astype(np.float32) * 0.2)

    def packed_loss(k):
        xp = space_to_depth(x, factors=factors)
        y = depth_to_space(packed_conv(xp, k, factors=factors),
                           factors=factors)
        return jnp.sum(y ** 2)

    g1 = jax.grad(packed_loss)(kern)
    g2 = jax.grad(lambda k: jnp.sum(direct_conv(x, k) ** 2))(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_partial_factors_down_up_and_splits(rng):
    from vnet_tpu.ops.s2d import packed_conv, packed_down_conv, s2d_up_conv
    factors = (2, 2, 1)
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 4, 3)).astype(np.float32))
    xp = space_to_depth(x, factors=factors)
    dims = ("NDHWC", "DHWIO", "NDHWC")

    kd = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 6)).astype(np.float32))
    want = jax.lax.conv_general_dilated(x, kd, (2, 2, 2), "SAME",
                                        dimension_numbers=dims)
    np.testing.assert_allclose(
        np.asarray(packed_down_conv(xp, kd, factors=factors)),
        np.asarray(want), atol=1e-4)

    ku = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 2)).astype(np.float32))
    want = jax.lax.conv_transpose(x, ku, (2, 2, 2), "SAME",
                                  dimension_numbers=dims)
    got = depth_to_space(
        s2d_up_conv(x, ku, keep_packed=True, out_factors=factors),
        factors=factors)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # flat-concat kernel row permutation under partial factors
    xb = jnp.asarray(rng.normal(size=(2, 8, 6, 4, 2)).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(size=(5, 5, 5, 5, 4)).astype(np.float32) * 0.2)
    want = direct_conv(jnp.concatenate([x, xb], -1), kern)
    xcat = jnp.concatenate([xp, space_to_depth(xb, factors=factors)], -1)
    got = depth_to_space(
        packed_conv(xcat, kern, factors=factors, input_splits=(3, 2)),
        factors=factors)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
