"""Halo-sharded whole-volume forward == unsharded forward.

SURVEY.md §5.7's "single patch too big for one chip" slot: the full V-Net
runs under shard_map with one spatial axis sharded over the mesh; every
stencil conv halo-exchanges (`vnet_tpu/parallel/spatial.py`). These tests
validate exact equality against the plain forward on the virtual 8-device
CPU mesh, across conv implementations, sharded axes, and norm modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.models import build_network
from vnet_tpu.parallel.mesh import make_mesh
from vnet_tpu.parallel.spatial import (spatial_sharded_forward,
                                       validate_partition)


def _forward_pair(norm, conv_impl, spatial_axis, vol_shape, num_levels=2,
                  shards=4, num_channels=4, lanes=0):
    net = build_network(
        "VNet", num_classes=2, dropout_rate=0.0, num_channels=num_channels,
        num_levels=num_levels, num_convolutions=(1,) * num_levels,
        bottom_convolutions=1, norm=norm, conv_impl=conv_impl,
        packed_target_lanes=lanes)
    rng = jax.random.PRNGKey(0)
    vol = jax.random.normal(jax.random.PRNGKey(1), vol_shape, jnp.float32)
    variables = net.init({"params": rng, "dropout": rng}, vol[None],
                         train=False)
    ref, _ = net.apply(variables, vol[None], train=False,
                       mutable=["batch_stats"])
    mesh = make_mesh(data_parallel=len(jax.devices()) // shards,
                     space_parallel=shards)
    out = spatial_sharded_forward(net, variables, vol, mesh,
                                  spatial_axis=spatial_axis)
    return np.asarray(ref[0]), np.asarray(jax.device_get(out))


@pytest.mark.parametrize("conv_impl", ["direct", "packed"])
def test_vnet3d_sharded_forward_matches(conv_impl):
    ref, out = _forward_pair("batch", conv_impl, 0, (32, 8, 8, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sharded_axis_choice():
    ref, out = _forward_pair("batch", "direct", 1, (8, 32, 8, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm", ["batch_stats", "instance", "group"])
def test_sharded_norm_statistics_match(norm):
    # stats-computing norms reduce over the sharded axis with pmean
    ref, out = _forward_pair(norm, "direct", 0, (32, 8, 8, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_vnet2d_sharded_forward_matches():
    ref, out = _forward_pair("batch", "direct", 0, (32, 8, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_multichannel_input_conv_sharded():
    # multichannel input path uses a 5^r conv at full res (networks.py:262)
    ref, out = _forward_pair("batch", "direct", 0, (32, 8, 8, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_partition_validation():
    with pytest.raises(ValueError):
        validate_partition((12, 8, 8, 1), 0, shards=4, num_levels=2)
    with pytest.raises(ValueError):  # bottom shard smaller than the halo
        validate_partition((16, 8, 8, 1), 0, shards=4, num_levels=2)
    validate_partition((32, 8, 8, 1), 0, shards=4, num_levels=2)


@pytest.mark.parametrize("spatial_axis", [0, 2])
def test_adaptive_packing_sharded_forward_matches(spatial_axis):
    # adaptive per-axis factors: 16ch packs all axes, 32ch level packs 2 —
    # the halo exchange must use the UNPACKED pad (k//2) on axes the level
    # leaves at factor 1 (ops/s2d.py::packed_pads)
    shape = [8, 8, 8, 1]
    shape[spatial_axis] = 32
    ref, out = _forward_pair("batch", "packed", spatial_axis, tuple(shape),
                             num_channels=16, lanes=64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# spatial-parallel TRAINING (spatial_sharded_train_step)


def _train_pair(loss_name, weights=(), conv_impl="direct", shards=4,
                spatial_axis=0, steps=2):
    """Run `steps` train steps sharded vs unsharded and return both final
    (params, batch_stats, losses)."""
    import optax

    from vnet_tpu.ops.losses import segmentation_loss
    from vnet_tpu.parallel.spatial import spatial_sharded_train_step

    net = build_network(
        "VNet", num_classes=3, dropout_rate=0.0, num_channels=4,
        num_levels=2, num_convolutions=(1, 1), bottom_convolutions=1,
        norm="batch", conv_impl=conv_impl)
    rng = jax.random.PRNGKey(0)
    shape = [16, 8, 8]
    # divisible by shards * 2**levels AND bottom-level local shard >= halo
    shape[spatial_axis] = 8 * shards
    images = jax.random.normal(jax.random.PRNGKey(1), (2, *shape, 1),
                               jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, *shape), 0, 3)
    variables = net.init({"params": rng, "dropout": rng}, images, train=True)
    # SGD, not Adam: BN-shadowed conv biases have mathematically-zero
    # gradients (~1e-9 float noise); Adam's g/sqrt(v) turns that noise
    # into O(lr) sign-random walks that differ across reduction orders,
    # SGD keeps it at the noise level
    tx = optax.sgd(1e-2)

    def unsharded(carry, step_rng):
        params, bs, opt = carry

        def loss_fn(p):
            out, mut = net.apply({"params": p, "batch_stats": bs}, images,
                                 train=True, rngs={"dropout": step_rng},
                                 mutable=["batch_stats"])
            loss, _ = segmentation_loss(out, labels, name=loss_name,
                                        num_classes=3, weights=weights)
            return loss, mut["batch_stats"]

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, nopt = tx.update(g, opt, params)
        import optax as _o
        return (_o.apply_updates(params, u), nbs, nopt), loss

    mesh = make_mesh(data_parallel=len(jax.devices()) // shards,
                     space_parallel=shards)
    sharded_step = spatial_sharded_train_step(
        net, tx, mesh, loss_name=loss_name, num_classes=3, weights=weights,
        spatial_axis=spatial_axis)

    carry_a = (variables["params"], variables["batch_stats"],
               tx.init(variables["params"]))
    carry_b = jax.tree_util.tree_map(lambda x: x, carry_a)
    la, lb = [], []
    for i in range(steps):
        step_rng = jax.random.PRNGKey(100 + i)
        carry_a, loss_a = unsharded(carry_a, step_rng)
        carry_b, loss_b = sharded_step(carry_b, images, labels, step_rng)
        la.append(float(loss_a))
        lb.append(float(loss_b))
    return carry_a, carry_b, la, lb


@pytest.mark.parametrize("loss_name,weights", [
    ("weighted_sorensen", (0.1, 0.5, 1.0)),
    ("mixed_jaccard", ()),
])
def test_spatial_train_step_matches_unsharded(loss_name, weights):
    """Two optimizer steps of spatially-sharded training reproduce the
    unsharded losses, parameters AND BatchNorm EMA stats (dropout 0)."""
    carry_a, carry_b, la, lb = _train_pair(loss_name, weights)
    np.testing.assert_allclose(la, lb, rtol=2e-5, atol=1e-6)
    for name, a, b in (("params", carry_a[0], carry_b[0]),
                       ("batch_stats", carry_a[1], carry_b[1])):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(jax.device_get(y)),
                rtol=2e-4, atol=2e-5), a, b)


def test_spatial_train_step_packed_axis1():
    """Packed conv_impl + sharding the second spatial dim."""
    carry_a, carry_b, la, lb = _train_pair(
        "sorensen", conv_impl="packed", shards=2, spatial_axis=1)
    np.testing.assert_allclose(la, lb, rtol=2e-5, atol=1e-6)


@pytest.mark.quick
def test_spatial_train_step_rejects_bad_partition():
    import optax

    from vnet_tpu.parallel.spatial import spatial_sharded_train_step

    net = build_network("VNet", num_classes=2, dropout_rate=0.0,
                        num_channels=4, num_levels=2,
                        num_convolutions=(1, 1), bottom_convolutions=1,
                        norm="batch")
    mesh = make_mesh(data_parallel=2, space_parallel=4)
    step = spatial_sharded_train_step(net, optax.sgd(0.1), mesh,
                                      loss_name="sorensen", num_classes=2)
    images = jnp.zeros((1, 12, 8, 8, 1))  # 12 % (4 * 2**2) != 0
    labels = jnp.zeros((1, 12, 8, 8), jnp.int32)
    with pytest.raises(ValueError, match="multiple"):
        step((None, None, None), images, labels, jax.random.PRNGKey(0))
