"""Export round-trip tests (meta_to_pb analog)."""

import jax
import numpy as np
import pytest

from vnet_tpu.export import export_forward, load_exported, stablehlo_text
from vnet_tpu.models import VNet


@pytest.fixture(scope="module")
def small_model():
    model = VNet(num_classes=2, num_channels=4, num_levels=1,
                 num_convolutions=(1,), bottom_convolutions=1,
                 dropout_rate=0.0)
    x = np.zeros((1, 8, 8, 8, 1), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables


def test_export_roundtrip(tmp_path, small_model, rng):
    model, variables = small_model
    path = str(tmp_path / "vnet_forward.stablehlo")
    blob = export_forward(model, variables, (1, 8, 8, 8, 1), path=path)
    assert len(blob) > 1000

    f = load_exported(path)
    x = rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    got = np.asarray(f(x))
    expected = np.asarray(jax.nn.softmax(
        model.apply(variables, x, train=False), axis=-1))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # softmax output sums to 1
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_stablehlo_text(small_model):
    model, variables = small_model
    text = stablehlo_text(model, variables, (1, 8, 8, 8, 1))
    assert "stablehlo" in text or "mhlo" in text or "func" in text
    assert "convolution" in text


def test_stablehlo_bytecode_export(tmp_path, small_model):
    from vnet_tpu.export import export_stablehlo_bytecode
    model, variables = small_model
    path = str(tmp_path / "fwd.stablehlo")
    blob = export_stablehlo_bytecode(model, variables, (1, 8, 8, 8, 1),
                                     path=path)
    assert len(blob) > 500
    # MLIR bytecode magic
    assert blob[:4] == b"ML\xefR" or b"stablehlo" in blob[:200]
    assert (tmp_path / "fwd.stablehlo").stat().st_size == len(blob)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
