"""Per-batch segmentation metrics as device-side reductions.

Parity with the reference's tf.metrics block
(`/root/reference/model.py:588-626`): overall accuracy plus, for every
non-background class, TP/TN/FP/FN-derived sensitivity, specificity and dice.
The reference resets its tf.metrics accumulators every step
(`model.py:730`), making them per-batch values — so a pure function over one
batch is the faithful (and jit-friendly) equivalent. AUC is computed from a
thresholded Riemann sum like tf.metrics.auc's default 200-bucket estimator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_counts(pred, labels, num_classes: int):
    """Per-class TP/TN/FP/FN over the whole batch.

    Args:
      pred: ``(B, *spatial)`` int predictions (argmax of logits).
      labels: ``(B, *spatial)`` int ground truth.
    Returns dict of ``(num_classes,)`` float32 arrays.
    """
    pred_oh = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    lbl_oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    axes = tuple(range(pred_oh.ndim - 1))
    tp = jnp.sum(pred_oh * lbl_oh, axis=axes)
    fp = jnp.sum(pred_oh * (1.0 - lbl_oh), axis=axes)
    fn = jnp.sum((1.0 - pred_oh) * lbl_oh, axis=axes)
    tn = jnp.sum((1.0 - pred_oh) * (1.0 - lbl_oh), axis=axes)
    return {"tp": tp, "tn": tn, "fp": fp, "fn": fn}


def batch_metrics(logits, labels, num_classes: int, compute_auc: bool = False,
                  auc_thresholds: int = 200):
    """Accuracy + per-class sensitivity/specificity/dice (+optional AUC).

    Returns a flat dict of scalars keyed like the reference's TensorBoard
    tags (`model.py:623-626`), with class *index* suffixes; callers map
    indices to configured class ids for logging.
    """
    pred = jnp.argmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    acc = jnp.mean((pred == labels).astype(jnp.float32))

    c = confusion_counts(pred, labels, num_classes)
    eps = 1e-7
    sens = c["tp"] / (c["tp"] + c["fn"] + eps)
    spec = c["tn"] / (c["tn"] + c["fp"] + eps)
    dice = 2.0 * c["tp"] / (2.0 * c["tp"] + c["fp"] + c["fn"] + eps)

    out = {"accuracy": acc}
    for i in range(1, num_classes):  # class 0 skipped, model.py:602-604
        out[f"sensitivity_{i}"] = sens[i]
        out[f"specificity_{i}"] = spec[i]
        out[f"dice_{i}"] = dice[i]

    if compute_auc:
        softmax = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        lbl_oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
        # thresholds as in tf.metrics.auc: midpoints plus boundary epsilons
        kepsilon = 1e-7
        ts = jnp.concatenate([
            jnp.array([0.0 - kepsilon]),
            (jnp.arange(1, auc_thresholds - 1, dtype=jnp.float32)
             / (auc_thresholds - 1)),
            jnp.array([1.0 + kepsilon]),
        ])
        for i in range(1, num_classes):
            p = softmax[..., i].reshape(-1)
            y = lbl_oh[..., i].reshape(-1)
            pred_pos = p[None, :] > ts[:, None]  # (T, N)
            tp = jnp.sum(pred_pos * y[None, :], axis=1)
            fp = jnp.sum(pred_pos * (1.0 - y[None, :]), axis=1)
            pos = jnp.sum(y) + eps
            neg = jnp.sum(1.0 - y) + eps
            tpr = tp / pos
            fpr = fp / neg
            # trapezoidal integration over decreasing fpr
            auc = jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)
            out[f"auc_{i}"] = auc
    return out
