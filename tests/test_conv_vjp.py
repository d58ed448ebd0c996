"""conv_custom_dw == lax.conv_general_dilated: forward and both grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.conv_vjp import conv_custom_dw, same_pads


@pytest.mark.parametrize("rank,k", [(2, 3), (2, 5), (3, 3), (3, 5)])
@pytest.mark.quick
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


@pytest.mark.quick
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


@pytest.mark.quick
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


def test_vnet_custom_dw_matches_default():
    """dw_impl is a pure autodiff rewrite: identical pytree, outputs,
    and gradients for both conv_impl modes and both non-XLA dW
    formulations (architecture invariant)."""
    from vnet_tpu.models import VNet

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 16, 16, 16, 1)).astype(np.float32))

    def build(**kw):
        return VNet(num_classes=2, num_channels=16, num_levels=2,
                    num_convolutions=(1, 2), bottom_convolutions=1,
                    dropout_rate=0.0, norm="batch", **kw)

    ref = build(conv_impl="packed", packed_target_lanes=128)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    def loss(model, p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_ref = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_scale = max(float(jnp.max(jnp.abs(l)))
                  for l in jax.tree_util.tree_leaves(g_ref))
    for impl, lanes, dw in (("packed", 128, "custom"),
                            ("direct", 0, "custom"),
                            ("packed", 128, "pallas")):
        m = build(conv_impl=impl, packed_target_lanes=lanes, dw_impl=dw)
        v2 = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        assert (jax.tree_util.tree_structure(v2["params"])
                == jax.tree_util.tree_structure(variables["params"]))
        out = np.asarray(m.apply(variables, x, train=False))
        out_ref = np.asarray(ref.apply(variables, x, train=False))
        np.testing.assert_allclose(out, out_ref, atol=2e-4)
        g = jax.grad(lambda p: loss(m, p))(variables["params"])
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g, g_ref)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3 * g_scale
