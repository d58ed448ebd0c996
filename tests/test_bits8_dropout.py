"""bits8 dropout impl (vnet_tpu/models/layers.py Dropout).

impl="bits8" keeps the XLA lowering shape of the float-uniform path
(rng fusion -> select fusion) but materializes the mask as uint8 —
4x less HBM traffic than the uint32-based bernoulli. Unlike the Pallas
kernel it is backend-agnostic, so the full distribution/scale/VJP
behavior is testable on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.models.layers import Dropout


def _apply(rate, x, seed=0, impl="bits8"):
    m = Dropout(rate=rate, impl=impl)
    return m.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(seed)})


def test_keep_fraction_and_scale():
    x = jnp.ones((256, 256), jnp.float32)
    rate = 0.25
    y = np.asarray(_apply(rate, x))
    t = round((1 - rate) * 256)          # 192 -> keep prob exactly 0.75
    keep = float((y != 0.0).mean())
    assert abs(keep - t / 256.0) < 0.02  # 256k samples, ~3 sigma = 0.0026
    # survivors carry exactly the quantized 1/keep scale
    np.testing.assert_allclose(y[y != 0.0], 256.0 / t, rtol=1e-6)


def test_expectation_unbiased():
    """E[out] == x with the QUANTIZED keep prob, even when rate*256 is
    not an integer (the scale must use t/256, not 1-rate)."""
    rate = 0.1  # t = round(0.9*256) = 230, keep = 0.8984375 != 0.9
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(_apply(rate, x, seed=3))
    assert abs(float(y.mean()) - 1.0) < 0.01


def test_deterministic_bypasses():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)),
                    jnp.float32)
    m = Dropout(rate=0.5, impl="bits8")
    y = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_bf16_dtype_preserved():
    y = _apply(0.5, jnp.ones((64, 128), jnp.bfloat16))
    assert y.dtype == jnp.bfloat16


def test_vjp_matches_mask():
    """dx = g * scale on kept positions, 0 on dropped — same mask as the
    forward (linear-in-x select)."""
    x = jnp.asarray(np.random.default_rng(1).normal(size=(128, 64)),
                    jnp.float32)
    g = jnp.asarray(np.random.default_rng(2).normal(size=(128, 64)),
                    jnp.float32)
    m = Dropout(rate=0.5, impl="bits8")

    def f(xx):
        return m.apply({}, xx, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})

    y, vjp = jax.vjp(f, x)
    (dx,) = vjp(g)
    y, dx = np.asarray(y), np.asarray(dx)
    kept = y != 0.0
    np.testing.assert_array_equal(dx == 0.0, ~kept)
    np.testing.assert_allclose(dx[kept], (np.asarray(g) * 2.0)[kept],
                               rtol=1e-5)


def test_extreme_rates_clamped():
    # rate so small that round(keep*256) == 256: clamps to 255 (still
    # drops ~1/256) instead of overflowing uint8
    y = np.asarray(_apply(1e-4, jnp.ones((512, 512), jnp.float32)))
    assert 0.0 < float((y == 0.0).mean()) < 0.02
    # rate so large that round(keep*256) == 0: clamps to 1 (still keeps
    # ~1/256 with scale 256)
    y = np.asarray(_apply(1.0 - 1e-4, jnp.ones((512, 512), jnp.float32)))
    keep = float((y != 0.0).mean())
    assert 0.0 < keep < 0.02
    np.testing.assert_allclose(y[y != 0.0], 256.0, rtol=1e-6)


def test_param_tree_and_eval_forward_unchanged():
    """Same checkpoint-interchange contract as DropoutImpl=pallas."""
    from vnet_tpu.models import VNet

    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)

    def build(impl):
        return VNet(num_classes=2, num_channels=4, num_levels=2,
                    num_convolutions=(1, 1), bottom_convolutions=1,
                    dropout_rate=0.1, norm="batch", dropout_impl=impl)

    va = build("xla").init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)
    vb = build("bits8").init({"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)}, x, train=True)
    assert (jax.tree_util.tree_structure(va["params"])
            == jax.tree_util.tree_structure(vb["params"]))
    oa = build("xla").apply(va, x, train=False)
    ob = build("bits8").apply(va, x, train=False)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_config_knob_reaches_network():
    from vnet_tpu.config import parse_config

    cfg = parse_config({
        "TrainingSetting": {
            "Data": {"TrainingDataDirectory": "", "TestingDataDirectory": "",
                     "ImageFilenames": ["image.nii"],
                     "LabelFilename": "label.nii"},
            "SegmentationClasses": [0, 1],
            "Networks": {"Name": "VNet", "DropoutImpl": "bits8"},
        },
        "EvaluationSetting": {"Data": {"EvaluateDataDirectory": ""}},
    })
    assert cfg.train.network.dropout_impl == "bits8"


pytestmark = pytest.mark.quick
