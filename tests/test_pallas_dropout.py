"""Fused Pallas dropout (vnet_tpu/ops/pallas/dropout.py).

NB: the TPU-flavoured Pallas interpreter stubs ``prng_random_bits`` to
ZEROS on CPU, so interpret-mode tests exercise plumbing, tiling, scaling
and the custom VJP only (zero bits < threshold == keep everything); the
actual keep-fraction distribution is asserted on real TPU
(tmp/exp_r2b.py, BENCHMARKS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.pallas.dropout import pallas_dropout


def test_interpret_scaling_and_shapes():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 8, 8, 16)).astype(np.float32))
    y = pallas_dropout(x, 123, 0.25, True)
    assert y.shape == x.shape and y.dtype == x.dtype
    # interpreter bits are all zero -> everything kept at x / keep
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) / 0.75,
                               rtol=1e-6)


def test_interpret_vjp_linear_in_x():
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(32, 16)).astype(np.float32))
    g = jnp.asarray(np.random.default_rng(2).normal(
        size=(32, 16)).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: pallas_dropout(xx, 7, 0.1, True), x)
    (dx,) = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(g) / 0.9,
                               rtol=1e-6)


def test_bf16_dtype_preserved():
    x = jnp.ones((16, 128), jnp.bfloat16)
    y = pallas_dropout(x, 3, 0.5, True)
    assert y.dtype == jnp.bfloat16


def test_vnet_dropout_impl_param_tree_unchanged():
    """dropout_impl is a pure compute choice: the parameter pytree (and so
    checkpoints) must be identical across implementations."""
    from vnet_tpu.models import VNet

    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)

    def init(impl):
        m = VNet(num_classes=2, num_channels=4, num_levels=2,
                 num_convolutions=(1, 1), bottom_convolutions=1,
                 dropout_rate=0.1, norm="batch", dropout_impl=impl)
        return m.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x, train=True)

    va = init("xla")
    vb = init("pallas")
    assert (jax.tree_util.tree_structure(va["params"])
            == jax.tree_util.tree_structure(vb["params"]))
    # eval-mode forward identical (dropout bypassed entirely)
    def build(impl):
        return VNet(num_classes=2, num_channels=4, num_levels=2,
                    num_convolutions=(1, 1), bottom_convolutions=1,
                    dropout_rate=0.1, norm="batch", dropout_impl=impl)

    ma, mb = build("xla"), build("pallas")
    oa = ma.apply(va, x, train=False)
    ob = mb.apply(va, x, train=False)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_is_tpu_backend_false_on_cpu():
    from vnet_tpu.ops.pallas import is_tpu_backend

    assert is_tpu_backend() is False  # tests run on the forced-CPU mesh


def test_cpu_fallback_is_real_dropout():
    """On a non-TPU backend impl='pallas' must fall back to the XLA path
    (the interpreter's stubbed PRNG would keep everything): train-mode
    output must actually drop values, not just rescale."""
    from vnet_tpu.models.layers import Dropout

    x = jnp.ones((64, 64), jnp.float32)
    m = Dropout(rate=0.5, impl="pallas")
    y = np.asarray(m.apply({}, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(0)}))
    zeros = float((y == 0.0).mean())
    assert 0.3 < zeros < 0.7          # real masking happened
    np.testing.assert_allclose(y[y != 0.0], 2.0, rtol=1e-6)  # 1/keep scale


def test_unknown_impl_raises():
    from vnet_tpu.models.layers import Dropout

    m = Dropout(rate=0.5, impl="nope")
    with pytest.raises(ValueError, match="dropout impl"):
        m.apply({}, jnp.ones((4, 4)), deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)})


def test_config_knob_reaches_network():
    from vnet_tpu.config import parse_config

    cfg = parse_config({
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": "", "TestingDataDirectory": "",
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1],
            "Networks": {"Name": "VNet", "DropoutImpl": "pallas"},
        },
        "EvaluationSetting": {"Data": {"EvaluateDataDirectory": ""}},
    })
    assert cfg.train.network.dropout_impl == "pallas"


def test_is_tpu_backend_detects_remote_plugin(monkeypatch):
    """Remote-TPU plugins can register under a non-'tpu' platform name
    (this environment's tunnel registers as 'axon' with device_kind
    'TPU v5 lite'); the probe must still detect TPU hardware."""
    import vnet_tpu.ops.pallas as pk

    class FakeDev:
        platform = "axon"
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    assert pk.is_tpu_backend() is True

    class FakeCpu:
        platform = "cpu"
        device_kind = "cpu"

    monkeypatch.setattr(jax, "devices", lambda: [FakeCpu()])
    assert pk.is_tpu_backend() is False


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
