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
