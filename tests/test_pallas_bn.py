"""Custom-VJP BatchNorm (Pallas-stats) == autodiff through plain XLA BN.

The Pallas reduction kernels themselves are validated in interpret mode in
test_pallas.py; here the custom_vjp calculus (forward values, dx, dscale,
dbias, and the mean/var cotangent paths) is checked against jax.grad of
the reference expression, on CPU via the kernels' XLA fallback path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.pallas import batchnorm as pbn


def reference_bn(x, scale, bias, groups, eps=1e-3):
    c = scale.shape[0]
    xg = x.reshape(x.shape[:-1] + (groups, c)).astype(jnp.float32)
    axes = tuple(range(xg.ndim - 1))
    mean = jnp.mean(xg, axis=axes)
    var = jnp.mean(jnp.square(xg), axis=axes) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (xg - mean) * inv * scale + bias
    return y.reshape(x.shape).astype(x.dtype), mean, var


@pytest.mark.parametrize("groups", [1, 8])
def test_custom_vjp_matches_autodiff(groups):
    rng = np.random.default_rng(0)
    c = 4
    x = jnp.asarray(rng.normal(size=(2, 6, 6, groups * c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) + 1.5
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    def loss_ref(x, scale, bias):
        y, mean, var = reference_bn(x, scale, bias, groups)
        # use mean/var too, exercising their cotangent paths
        return jnp.sum(y * w) + 0.3 * jnp.sum(mean) + 0.7 * jnp.sum(var)

    def loss_new(x, scale, bias):
        y, mean, var = pbn.batch_norm_train(x, scale, bias, 0.0, groups)
        return jnp.sum(y * w) + 0.3 * jnp.sum(mean) + 0.7 * jnp.sum(var)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        x, scale, bias)
    v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2))(
        x, scale, bias)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-5)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_forward_values_and_moments():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5, 8)).astype(np.float32))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))
    y, mean, var = pbn.batch_norm_train(x, scale, bias, 0.0, 1)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(jnp.mean(x, axis=(0, 1))),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(var),
        np.asarray(jnp.mean(x * x, axis=(0, 1))
                   - jnp.mean(x, axis=(0, 1)) ** 2),
        rtol=1e-4, atol=1e-6)
    # normalized output has ~zero mean / ~unit variance per channel
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1))), 0,
                               atol=1e-5)


def test_bf16_dtype_preserved():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y, mean, var = pbn.batch_norm_train(x, jnp.ones((16,)), jnp.zeros((16,)),
                                        0.0, 1)
    assert y.dtype == jnp.bfloat16
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
