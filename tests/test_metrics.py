"""Metric parity tests vs. naive numpy (reference model.py:588-626)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vnet_tpu.ops.metrics import batch_metrics, confusion_counts


def test_confusion_counts(rng):
    pred = rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32)
    lbl = rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32)
    c = confusion_counts(jnp.array(pred), jnp.array(lbl), 3)
    for i in range(3):
        p, y = pred == i, lbl == i
        assert float(c["tp"][i]) == np.sum(p & y)
        assert float(c["fp"][i]) == np.sum(p & ~y)
        assert float(c["fn"][i]) == np.sum(~p & y)
        assert float(c["tn"][i]) == np.sum(~p & ~y)


def test_batch_metrics_perfect():
    lbl = np.zeros((1, 4, 4, 4), np.int32)
    lbl[0, :2] = 1
    logits = np.eye(2, dtype=np.float32)[lbl] * 10.0
    m = batch_metrics(jnp.array(logits), jnp.array(lbl), 2)
    assert float(m["accuracy"]) == pytest.approx(1.0)
    assert float(m["dice_1"]) == pytest.approx(1.0, abs=1e-5)
    assert float(m["sensitivity_1"]) == pytest.approx(1.0, abs=1e-5)
    assert float(m["specificity_1"]) == pytest.approx(1.0, abs=1e-5)


def test_batch_metrics_values(rng):
    lbl = rng.integers(0, 2, size=(2, 6, 6)).astype(np.int32)
    pred = rng.integers(0, 2, size=(2, 6, 6)).astype(np.int32)
    logits = np.eye(2, dtype=np.float32)[pred] * 5.0
    m = batch_metrics(jnp.array(logits), jnp.array(lbl), 2)
    tp = np.sum((pred == 1) & (lbl == 1))
    fp = np.sum((pred == 1) & (lbl == 0))
    fn = np.sum((pred == 0) & (lbl == 1))
    expected_dice = 2 * tp / (2 * tp + fp + fn)
    assert float(m["dice_1"]) == pytest.approx(expected_dice, rel=1e-4)
    assert float(m["accuracy"]) == pytest.approx(np.mean(pred == lbl), rel=1e-6)


def test_auc_sane(rng):
    lbl = rng.integers(0, 2, size=(1, 8, 8)).astype(np.int32)
    # logits proportional to labels -> separable -> AUC near 1
    logits = np.stack([1.0 - lbl, lbl.astype(np.float32)], axis=-1) * 8.0
    m = batch_metrics(jnp.array(logits), jnp.array(lbl), 2, compute_auc=True)
    assert float(m["auc_1"]) > 0.99
    # random scores -> AUC near 0.5
    logits = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    m = batch_metrics(jnp.array(logits), jnp.array(lbl), 2, compute_auc=True)
    assert 0.2 < float(m["auc_1"]) < 0.8


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
