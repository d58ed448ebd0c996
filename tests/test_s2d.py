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
