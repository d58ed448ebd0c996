"""Golden-value tests for the loss zoo (reference semantics model.py:26-92,
495-560) computed against independent numpy implementations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vnet_tpu.ops.losses import (LOSS_NAMES, dice_coe, segmentation_loss,
                                 softmax_cross_entropy,
                                 weighted_softmax_cross_entropy)


def np_softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def np_dice(output, target, loss_type, axis, weights=(), smooth=1e-5):
    inse = (output * target).sum(axis=axis)
    if loss_type == "jaccard":
        l = (output * output).sum(axis=axis)
        r = (target * target).sum(axis=axis)
    else:
        l = output.sum(axis=axis)
        r = target.sum(axis=axis)
    if len(weights):
        w = np.asarray(weights, np.float32)
        d = (2 * w * inse + smooth).sum(-1) / (w * (l + r) + smooth).sum(-1)
        return d.mean()
    return ((2 * inse + smooth) / (l + r + smooth)).mean()


@pytest.fixture
def batch(rng):
    logits = rng.normal(size=(2, 4, 4, 3, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 4, 4, 3)).astype(np.int32)
    return logits, labels


def test_dice_perfect_overlap():
    t = np.zeros((1, 4, 4, 4, 2), np.float32)
    t[..., 0] = 1.0
    val = dice_coe(jnp.array(t), jnp.array(t), loss_type="sorensen",
                   axis=(1, 2, 3))
    assert float(val) == pytest.approx(1.0, abs=1e-5)


def test_dice_empty_is_one():
    # both empty -> smooth/smooth = 1 per class (model.py docstring behavior)
    z = np.zeros((1, 4, 4, 4, 1), np.float32)
    val = dice_coe(jnp.array(z), jnp.array(z), loss_type="sorensen",
                   axis=(1, 2, 3))
    assert float(val) == pytest.approx(1.0, abs=1e-5)


def test_dice_disjoint_near_zero():
    a = np.zeros((1, 4, 4, 4, 1), np.float32)
    b = np.zeros_like(a)
    a[0, :2], b[0, 2:] = 1.0, 1.0
    val = dice_coe(jnp.array(a), jnp.array(b), loss_type="jaccard",
                   axis=(1, 2, 3))
    assert float(val) == pytest.approx(0.0, abs=1e-4)


@pytest.mark.parametrize("loss_type", ["sorensen", "jaccard"])
@pytest.mark.parametrize("weights", [(), (0.01, 0.1, 1.0)])
def test_dice_matches_numpy(batch, loss_type, weights):
    logits, labels = batch
    sm = np_softmax(logits)
    onehot = np.eye(3, dtype=np.float32)[labels]
    expected = np_dice(sm, onehot, loss_type, axis=(1, 2, 3), weights=weights)
    got = dice_coe(jnp.array(sm), jnp.array(onehot), loss_type=loss_type,
                   axis=(1, 2, 3), weights=weights)
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


def test_xent_matches_numpy(batch):
    logits, labels = batch
    onehot = np.eye(3, dtype=np.float32)[labels]
    logp = np.log(np_softmax(logits))
    expected = (-(onehot * logp).sum(-1)).mean()
    got = softmax_cross_entropy(jnp.array(onehot), jnp.array(logits))
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


def test_weighted_xent_matches_numpy(batch):
    logits, labels = batch
    w = np.array([0.5, 1.0, 2.0], np.float32)
    onehot = np.eye(3, dtype=np.float32)[labels]
    logp = np.log(np_softmax(logits))
    voxel_w = (onehot * w).sum(-1)
    expected = ((-(onehot * logp).sum(-1)) * voxel_w).mean()
    got = weighted_softmax_cross_entropy(jnp.array(onehot), jnp.array(logits), w)
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


@pytest.mark.parametrize("name", LOSS_NAMES)
def test_dispatch_all_names(batch, name):
    logits, labels = batch
    loss, aux = segmentation_loss(
        jnp.array(logits), jnp.array(labels), name=name, num_classes=3,
        weights=(0.01, 0.1, 1.0), alpha=0.5)
    assert np.isfinite(float(loss))
    assert float(aux["total_loss"]) == pytest.approx(float(loss))
    if name.startswith("mixed"):
        assert float(loss) == pytest.approx(
            float(aux["dice"]) + float(aux["regularized_xent"]), rel=1e-6)


def test_dispatch_consistency(batch):
    """mixed variants = dice variant + alpha*xent variant."""
    logits, labels = batch
    lj, lb = jnp.array(logits), jnp.array(labels)
    kw = dict(num_classes=3, weights=(0.01, 0.1, 1.0))
    sor, _ = segmentation_loss(lj, lb, name="sorensen", **kw)
    xent, _ = segmentation_loss(lj, lb, name="xent", **kw)
    mixed, _ = segmentation_loss(lj, lb, name="mixed_sorensen", alpha=2.0, **kw)
    assert float(mixed) == pytest.approx(float(sor) + 2.0 * float(xent), rel=1e-5)


def test_invalid_name_raises(batch):
    logits, labels = batch
    with pytest.raises(ValueError):
        segmentation_loss(jnp.array(logits), jnp.array(labels),
                          name="nope", num_classes=3)


def test_loss_is_differentiable(batch):
    logits, labels = batch

    def f(lg):
        return segmentation_loss(lg, jnp.array(labels),
                                 name="mixed_weighted_sorensen", num_classes=3,
                                 weights=(0.01, 0.1, 1.0))[0]

    g = jax.grad(f)(jnp.array(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_2d_axis_handling(rng):
    """2D mode reduces over (1,2) (model.py:501)."""
    logits = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=(2, 8, 8)).astype(np.int32)
    loss, _ = segmentation_loss(jnp.array(logits), jnp.array(labels),
                                name="sorensen", num_classes=2)
    sm = np_softmax(logits)
    onehot = np.eye(2, dtype=np.float32)[labels]
    expected = 1.0 - np_dice(sm, onehot, "sorensen", axis=(1, 2))
    assert float(loss) == pytest.approx(float(expected), rel=1e-5)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
