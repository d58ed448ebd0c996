"""conv_custom_dw == lax.conv_general_dilated: forward and both grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.conv_vjp import conv_custom_dw, same_pads


@pytest.mark.parametrize("rank,k", [(2, 3), (2, 5), (3, 3), (3, 5)])
def test_matches_lax_conv(rank, k):
    rng = np.random.default_rng(0)
    spatial = (8,) * rank
    x = jnp.asarray(rng.normal(size=(2, *spatial, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k,) * rank + (4, 6)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, *spatial, 6)).astype(np.float32))
    pads = same_pads((k,) * rank)
    dims = (("NHWC", "HWIO", "NHWC") if rank == 2
            else ("NDHWC", "DHWIO", "NDHWC"))

    def ref(x, w):
        return jax.lax.conv_general_dilated(x, w, (1,) * rank, pads,
                                            dimension_numbers=dims)

    y_ref = ref(x, w)
    y = conv_custom_dw(x, w, pads)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    dx_ref, dw_ref = jax.grad(
        lambda x, w: jnp.sum(ref(x, w) * g), argnums=(0, 1))(x, w)
    dx, dw = jax.grad(
        lambda x, w: jnp.sum(conv_custom_dw(x, w, pads) * g),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


def test_asymmetric_pads_packed_shape():
    """The packed-domain mixed-tap kernel shape (3,3,5) with its
    packed_pads-style padding."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 8, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 16, 8)).astype(np.float32))
    pads = ((1, 1), (1, 1), (2, 2))
    dims = ("NDHWC", "DHWIO", "NDHWC")

    def ref(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1, 1), pads,
                                            dimension_numbers=dims)

    dw_ref = jax.grad(lambda w: jnp.sum(ref(x, w) * g))(w)
    dw = jax.grad(lambda w: jnp.sum(conv_custom_dw(x, w, pads) * g))(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


def test_bfloat16_dtype_preserved():
    x = jnp.ones((1, 4, 4, 4, 2), jnp.bfloat16)
    w = jnp.ones((3, 3, 3, 2, 2), jnp.bfloat16)
    pads = same_pads((3, 3, 3))
    y = conv_custom_dw(x, w, pads)
    assert y.dtype == jnp.bfloat16
    dx, dw = jax.grad(lambda x, w: jnp.sum(
        conv_custom_dw(x, w, pads).astype(jnp.float32)),
        argnums=(0, 1))(x, w)
    assert dw.dtype == jnp.bfloat16 and dx.dtype == jnp.bfloat16
