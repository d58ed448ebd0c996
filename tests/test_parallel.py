"""Mesh + halo-exchange tests on the virtual 8-device CPU mesh
(SURVEY.md §2.5/§5.7 equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vnet_tpu.parallel import make_mesh, pad_batch_to_multiple, shard_batch
from vnet_tpu.parallel.halo import halo_exchange, sharded_conv, shard_volume


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data", "space")
    m = make_mesh(4, 2)
    assert m.shape["data"] == 4
    assert m.shape["space"] == 2
    with pytest.raises(ValueError):
        make_mesh(16, 1)


def test_shard_batch_roundtrip(rng):
    m = make_mesh()
    x = rng.normal(size=(8, 4, 4)).astype(np.float32)
    xs = shard_batch(m, x)
    np.testing.assert_allclose(np.asarray(xs), x)


def test_pad_batch_to_multiple():
    x = np.arange(6).reshape(6, 1)
    padded, n = pad_batch_to_multiple(x, 4)
    assert padded.shape == (8, 1)
    assert n == 6
    np.testing.assert_array_equal(padded[6:], [[5], [5]])


def test_halo_exchange_reconstructs_neighbors(rng):
    mesh = make_mesh(1, 8)
    x = rng.normal(size=(32, 4)).astype(np.float32)

    def f(local):
        return halo_exchange(local, 2, "space", 0)

    out = shard_map(f, mesh=mesh, in_specs=P("space"),
                    out_specs=P("space"))(jnp.asarray(x))
    out = np.asarray(out)  # (8 * (4+4), 4): each shard grew 4 -> 8 rows
    assert out.shape == (64, 4)
    # shard 1's halo-padded block = rows 2..10 of the global array
    block1 = out[8:16]
    np.testing.assert_allclose(block1, x[2:10])
    # shard 0's left halo is zeros
    np.testing.assert_allclose(out[0:2], 0.0)
    np.testing.assert_allclose(out[2:8], x[0:6])


@pytest.mark.parametrize("rank,k", [(2, 3), (3, 5)])
def test_sharded_conv_matches_unsharded(rng, rank, k):
    mesh = make_mesh(1, 8)
    spatial = (16,) * rank
    cin, cout = 2, 3
    vol = rng.normal(size=spatial + (cin,)).astype(np.float32)
    kernel = rng.normal(size=(k,) * rank + (cin, cout)).astype(np.float32) * 0.1

    conv = sharded_conv(mesh, "space", spatial_axis=0)
    out_sharded = np.asarray(conv(jnp.asarray(vol), jnp.asarray(kernel)))

    dims = ("NHWC", "HWIO", "NHWC") if rank == 2 else ("NDHWC", "DHWIO", "NDHWC")
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(vol)[None], jnp.asarray(kernel), (1,) * rank, "SAME",
        dimension_numbers=dims)[0]
    np.testing.assert_allclose(out_sharded, np.asarray(ref), atol=1e-4)


def test_shard_volume_placement(rng):
    mesh = make_mesh(1, 8)
    vol = rng.normal(size=(32, 8, 8, 1)).astype(np.float32)
    sharded = shard_volume(mesh, "space", 0, vol)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), vol)


def test_gradient_allreduce_semantics(rng):
    """DP training semantics: the global-batch gradient from a shard_map
    where the loss is pmean'd across the data axis equals the unsharded
    gradient. (Differentiating w.r.t. a REPLICATED input inside shard_map
    inserts the gradient psum automatically — the DP all-reduce the
    reference never had, compiled by XLA over ICI.)"""
    mesh = make_mesh(8, 1)
    w = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))

    def loss(w, x):
        return jnp.mean(jnp.sum(x * w, axis=-1) ** 2)

    g_global = jax.grad(loss)(w, x)

    def local_grad(w, xs):
        # global loss = pmean of local mean losses; grad wrt replicated w
        # then carries the implicit cross-device psum.
        return jax.grad(
            lambda w_: jax.lax.pmean(loss(w_, xs), "data"))(w)

    g_dp = shard_map(local_grad, mesh=mesh, in_specs=(P(), P("data")),
                     out_specs=P())(w, x)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_global),
                               rtol=1e-5)


def test_multislice_mesh_fallback_cpu():
    from vnet_tpu.parallel.mesh import (make_multislice_mesh,
                                        shard_batch_per_host)
    import jax
    import numpy as np
    # CPU devices expose no slice topology -> slice-major fallback
    mesh = make_multislice_mesh(ici_data_parallel=2, dcn_data_parallel=2,
                                space_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}

    mesh2 = make_multislice_mesh()  # infer: 1 slice, all devices on data
    assert dict(mesh2.shape) == {"data": 8, "space": 1}

    with pytest.raises(ValueError, match="devices"):
        make_multislice_mesh(ici_data_parallel=3, dcn_data_parallel=2)

    # single-process per-host feeding == plain shard_batch
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    a = shard_batch_per_host(mesh2, x)
    np.testing.assert_array_equal(np.asarray(a), x)
    assert a.sharding.spec == jax.sharding.PartitionSpec("data")


def test_tensor_parallel_conv_matches_unsharded():
    """Minimal TP (SURVEY §2.5 optional row): output-channel-sharded conv
    over a `model` axis equals the unsharded conv; kernel shards live on
    their own devices."""
    import jax
    import jax.numpy as jnp
    from vnet_tpu.parallel.tensor import (make_tp_mesh, replicate,
                                          shard_kernel, tp_conv)

    mesh = make_tp_mesh(4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 8)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    xs = replicate(mesh, x)
    ks = shard_kernel(mesh, k)
    # the kernel really is channel-sharded across 4 devices
    assert len(ks.sharding.device_set) == 4
    out = tp_conv(mesh, xs, ks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # 2D rank as well
    x2 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    ref2 = jax.lax.conv_general_dilated(
        x2, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out2 = tp_conv(mesh, replicate(mesh, x2), shard_kernel(mesh, k2))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)

    with pytest.raises(ValueError, match="not divisible"):
        tp_conv(mesh, xs, jnp.zeros((3, 3, 3, 4, 6)))


class _FakeSlicedDevice:
    """Minimal attribute surface mesh_utils.create_hybrid_device_mesh uses."""

    def __init__(self, i, slice_index):
        self.id = i
        self.slice_index = slice_index
        self.process_index = slice_index
        self.platform = "tpu"
        self.device_kind = "TPU v5e (fake)"
        self.coords = (i % 2, (i // 2) % 2, 0)
        self.core_on_chip = 0

    def __repr__(self):
        return f"FakeDev({self.id}, slice={self.slice_index})"


def test_multislice_mesh_hybrid_branch_with_topology():
    """With a real slice topology the hybrid (DCN-aware) mesh builder runs:
    the data axis is DCN-major so each contiguous ICI block stays inside
    one slice — and misconfigurations propagate instead of silently
    falling back (round-1 ADVICE: the old except swallowed everything)."""
    from vnet_tpu.parallel.mesh import make_multislice_mesh

    devs = [_FakeSlicedDevice(i, i // 4) for i in range(8)]
    mesh = make_multislice_mesh(ici_data_parallel=4, dcn_data_parallel=2,
                                devices=devs)
    grid = np.asarray(mesh.devices).reshape(8)
    assert {d.slice_index for d in grid[:4]} == {0}
    assert {d.slice_index for d in grid[4:]} == {1}

    # a topology-present misconfiguration must raise, not fall back
    with pytest.raises(Exception):
        make_multislice_mesh(ici_data_parallel=8, dcn_data_parallel=1,
                             devices=devs)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
