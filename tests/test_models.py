"""Model zoo shape/behavior tests (reference topology networks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.models import (AttentionGatedVNet, Dense, UNet, VNet,
                             attention_distance_loss, build_network)


def init_and_apply(model, x, train=False, **apply_kw):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=True)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"] if train else False, **apply_kw)
    if train:
        out = out[0]
    return variables, out


@pytest.mark.parametrize("spatial,channels", [((16, 16, 16), 1),
                                              ((16, 16, 16), 2),
                                              ((32, 32), 1)])
def test_vnet_shapes(spatial, channels):
    x = jnp.ones((2, *spatial, channels), jnp.float32)
    model = VNet(num_classes=3, num_channels=4, num_levels=2,
                 num_convolutions=(1, 2), bottom_convolutions=1)
    _, logits = init_and_apply(model, x)
    assert logits.shape == (2, *spatial, 3)
    assert logits.dtype == jnp.float32


def test_vnet_level_count_mismatch_raises():
    x = jnp.ones((1, 8, 8, 8, 1), jnp.float32)
    model = VNet(num_classes=2, num_levels=3, num_convolutions=(1, 2))
    with pytest.raises(AssertionError):
        model.init({"params": jax.random.PRNGKey(0)}, x, train=False)


@pytest.mark.quick
def test_vnet_channel_progression():
    """Encoder doubles channels per level (networks.py:274-280)."""
    x = jnp.ones((1, 16, 16, 16, 1), jnp.float32)
    model = VNet(num_classes=2, num_channels=4, num_levels=2,
                 num_convolutions=(1, 1), bottom_convolutions=1)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = variables["params"]
    # down_1 doubles 4 -> 8; down_2 doubles 8 -> 16
    assert params["down_1"]["conv"]["kernel"].shape[-1] == 8
    assert params["down_2"]["conv"]["kernel"].shape[-1] == 16
    # encoder convs are 5^3 (networks.py:314-316)
    assert params["encoder_level_1"]["conv_1"]["kernel"].shape[:3] == (5, 5, 5)


@pytest.mark.parametrize("spatial", [(16, 16, 16), (32, 32)])
def test_unet_shapes(spatial):
    x = jnp.ones((2, *spatial, 1), jnp.float32)
    model = UNet(num_classes=2, num_channels=4, num_levels=2,
                 num_convolutions=1, bottom_convolutions=1)
    _, logits = init_and_apply(model, x)
    assert logits.shape == (2, *spatial, 2)


def test_dense_shapes():
    x = jnp.ones((2, 8, 8, 1), jnp.float32)
    model = Dense(num_classes=2, num_levels=2)
    _, logits = init_and_apply(model, x)
    assert logits.shape == (2, 8, 8, 2)


def test_attention_gated_vnet():
    x = jnp.ones((1, 16, 16, 16, 1), jnp.float32)
    model = AttentionGatedVNet(num_classes=2, num_channels=4, num_levels=2,
                               num_convolutions=(1, 1),
                               bottom_convolutions=1, attention_channels=8)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=False)
    logits, att = model.apply(variables, x, train=False)
    assert logits.shape == (1, 16, 16, 16, 2)
    assert att.shape == (1, 16, 16, 16, 2)

    dist = jnp.zeros((1, 16, 16, 16))
    loss = attention_distance_loss(att, dist, kind="l2")
    assert np.isfinite(float(loss))


def test_build_network_dispatch():
    net = build_network("VNet", num_classes=2, num_channels=4, num_levels=2,
                        num_convolutions=(1, 1), bottom_convolutions=1)
    assert isinstance(net, VNet)
    assert net.activation == "prelu"  # model.py:437 hardcodes prelu for VNet
    net = build_network("UNet", num_classes=2)
    assert isinstance(net, UNet)
    assert net.activation == "relu"  # model.py:426
    with pytest.raises(NotImplementedError):
        build_network("FCN", num_classes=2)
    with pytest.raises(ValueError):
        build_network("nope", num_classes=2)


def test_train_updates_batch_stats():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8, 1))
    model = VNet(num_classes=2, num_channels=4, num_levels=1,
                 num_convolutions=(1,), bottom_convolutions=1)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=True)
    _, new_state = model.apply(variables, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_dropout_is_stochastic_in_train():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8, 1))
    model = VNet(num_classes=2, num_channels=4, num_levels=1,
                 num_convolutions=(1,), bottom_convolutions=1,
                 dropout_rate=0.5)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=True)
    a, _ = model.apply(variables, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(10)},
                       mutable=["batch_stats"])
    b, _ = model.apply(variables, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(11)},
                       mutable=["batch_stats"])
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # eval is deterministic
    c = model.apply(variables, x, train=False)
    d = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))


@pytest.mark.quick
def test_bfloat16_compute_f32_params():
    x = jnp.ones((1, 8, 8, 8, 1), jnp.float32)
    model = VNet(num_classes=2, num_channels=4, num_levels=1,
                 num_convolutions=(1,), bottom_convolutions=1,
                 dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    logits = model.apply(variables, x, train=False)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_vnet_adaptive_packing_matches_direct():
    """packed_target_lanes: each level packs only enough axes to fill the
    MXU lanes (ops/s2d.py per-axis factors) — outputs, gradients, and the
    parameter pytree are identical to the direct implementation."""
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 16, 16, 1)).astype(np.float32))

    def build(**kw):
        return VNet(num_classes=2, num_channels=16, num_levels=3,
                    num_convolutions=(1, 1, 2), bottom_convolutions=1,
                    dropout_rate=0.0, norm="batch", **kw)

    ref = build(conv_impl="direct")
    variables = ref.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x, train=True)
    out_ref = np.asarray(ref.apply(variables, x, train=False))

    def loss(model, p):
        out, _ = model.apply({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_ref = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_scale = max(float(jnp.max(jnp.abs(l)))
                  for l in jax.tree_util.tree_leaves(g_ref))
    for lanes in (64, 128):
        m = build(conv_impl="packed", packed_target_lanes=lanes)
        v2 = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x, train=True)
        assert (jax.tree_util.tree_structure(v2["params"])
                == jax.tree_util.tree_structure(variables["params"]))
        out = np.asarray(m.apply(variables, x, train=False))
        np.testing.assert_allclose(out, out_ref, atol=2e-4)
        g = jax.grad(lambda p: loss(m, p))(variables["params"])
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g, g_ref)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3 * g_scale


def test_adaptive_factors_odd_leading_dim():
    """An odd leading spatial dim must not disable packing when enough
    trailing dims are even: the even axes get the factor-2 packing."""
    from vnet_tpu.models.vnet import adaptive_factors

    assert adaptive_factors((16, 16, 16), 16, 128) == (True, (2, 2, 2))
    assert adaptive_factors((16, 16, 16), 32, 128) == (True, (2, 2, 1))
    assert adaptive_factors((16, 16, 16), 128, 128) == (False, None)
    # odd leading dim: pick the even trailing axes instead of giving up
    assert adaptive_factors((9, 16, 16), 32, 128) == (True, (1, 2, 2))
    assert adaptive_factors((9, 16, 16), 16, 128) == (False, None)  # needs 3
    assert adaptive_factors((16, 9, 16), 64, 128) == (True, (2, 1, 1))


def test_convblock_packed_non_leading_factors_match_direct():
    """ConvBlock in packed mode with factors (1,2,2) — the odd-leading-dim
    configuration adaptive_factors now selects — matches the direct conv."""
    from vnet_tpu.models.vnet import ConvBlock

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 9, 16, 16, 16)).astype(np.float32))
    ref = ConvBlock(2, norm="batch", dropout_rate=0.0, conv_impl="direct")
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out_ref = np.asarray(ref.apply(variables, x, train=False))

    m = ConvBlock(2, norm="batch", dropout_rate=0.0, packed_mode=True,
                  packed_factors=(1, 2, 2))
    out = np.asarray(m.apply(variables, x, train=False))
    np.testing.assert_allclose(out, out_ref, atol=2e-4)


def test_attention_remat_matches_plain():
    """remat=True is a pure memory/recompute trade — outputs and grads
    are identical (same params, same rngs)."""
    x = jnp.ones((1, 8, 8, 8, 1), jnp.float32)
    kw = dict(num_classes=2, num_channels=4, num_levels=2,
              num_convolutions=(1, 1), bottom_convolutions=1,
              attention_channels=8, dropout_rate=0.0)
    plain = AttentionGatedVNet(**kw)
    remat = AttentionGatedVNet(remat=True, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = plain.init(rngs, x, train=False)
    # same parameter structure: remat wrapping must not rename scopes
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(remat.init(rngs, x, train=False)))

    out_p, att_p = plain.apply(variables, x, train=False)
    out_r, att_r = remat.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)

    def loss(m):
        def f(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return jnp.sum(out[0] ** 2)
        return jax.grad(f)(variables["params"])

    gp, gr = loss(plain), loss(remat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6), gp, gr)


@pytest.mark.quick
def test_vnet_backbone_remat_matches_plain():
    """VNet remat=True (conv blocks rematerialized): same parameter pytree,
    same outputs, same grads — a pure memory/recompute trade."""
    from vnet_tpu.models import VNet

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 8, 8, 8, 1)).astype(np.float32))
    kw = dict(num_classes=2, num_channels=4, num_levels=2,
              num_convolutions=(1, 2), bottom_convolutions=1,
              dropout_rate=0.0, norm="batch")
    plain = VNet(**kw)
    remat = VNet(remat=True, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = plain.init(rngs, x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(remat.init(rngs, x, train=False)))

    out_p = plain.apply(variables, x, train=False)
    out_r = remat.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)

    def grads(m):
        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return jax.grad(f)(variables["params"])

    gp, gr = grads(plain), grads(remat)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6), gp, gr)


@pytest.mark.quick
def test_legacy_double_norm_topology():
    """VNetLegacy (`/root/reference/VNet.py`): every conv normalized both
    before (pre_norm_i) and after the residual add — EXCEPT the first conv
    of a multi-conv decoder block, which keeps a single norm
    (VNet.py:57-61). Packed and direct impls share the pytree and agree."""
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 16, 16, 1)).astype(np.float32))

    def build(**kw):
        return build_network("VNetLegacy", num_classes=2, num_channels=16,
                             num_levels=2, num_convolutions=(1, 2),
                             bottom_convolutions=1, dropout_rate=0.0,
                             norm="batch", **kw)

    ref = build(conv_impl="direct", packed_target_lanes=0)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    params = variables["params"]

    # encoder level 2 has 2 convs -> both get pre_norm (VNet.py:26-39)
    assert "pre_norm_1" in params["encoder_level_2"]
    assert "pre_norm_2" in params["encoder_level_2"]
    # decoder level 2 has 2 convs -> first conv has NO pre_norm
    assert "pre_norm_1" not in params["decoder_level_2"]
    assert "pre_norm_2" in params["decoder_level_2"]
    # decoder level 1 has 1 conv -> its single conv DOES get pre_norm
    assert "pre_norm_1" in params["decoder_level_1"]

    # modern VNet must NOT grow pre_norm layers
    modern = VNet(num_classes=2, num_channels=16, num_levels=2,
                  num_convolutions=(1, 2), bottom_convolutions=1,
                  dropout_rate=0.0, norm="batch")
    vm = modern.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    flat = jax.tree_util.tree_leaves_with_path(vm["params"])
    assert not any("pre_norm" in jax.tree_util.keystr(p) for p, _ in flat)

    # packed impl: identical pytree + matching outputs
    out_ref = np.asarray(ref.apply(variables, x, train=False))
    m = build(conv_impl="packed", packed_target_lanes=128)
    v2 = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert (jax.tree_util.tree_structure(v2["params"])
            == jax.tree_util.tree_structure(params))
    out = np.asarray(m.apply(variables, x, train=False))
    np.testing.assert_allclose(out, out_ref, atol=2e-4)


@pytest.mark.quick
def test_attention_legacy_backbone():
    """--attention + --legacy_topology: the gate is built on the legacy
    double-norm backbone (reference train.py:271-279 wraps VNet.py)."""
    x = jnp.ones((1, 8, 8, 8, 1), jnp.float32)
    m = build_network("AttentionVNet", num_classes=2, num_channels=4,
                      num_levels=2, num_convolutions=(1, 1),
                      bottom_convolutions=1, dropout_rate=0.0,
                      conv_impl="direct", packed_target_lanes=0,
                      legacy_double_norm=True)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "pre_norm_1" in v["params"]["vnet"]["encoder_level_1"]
