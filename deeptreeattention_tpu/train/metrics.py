"""Classification metrics (torchmetrics-compatible semantics, numpy/jnp).

Covers the metric surface the reference consumes (micro/macro/top-k accuracy,
per-class accuracy & precision; reference src/main.py:52-61,
src/models/multi_stage.py:323-366): macro accuracy averages per-class recall
over classes present in the target; per-class vectors are NaN-free (0 where a
class has no support, matching torchmetrics' zero_division default of 0).
"""
import numpy as np


def micro_accuracy(preds, target):
    preds = np.asarray(preds)
    target = np.asarray(target)
    if preds.size == 0:
        return 0.0
    return float(np.mean(preds == target))


def macro_accuracy(preds, target, num_classes):
    """Mean per-class recall over classes that appear in target."""
    preds = np.asarray(preds)
    target = np.asarray(target)
    recalls = []
    for c in range(num_classes):
        mask = target == c
        if mask.sum() == 0:
            continue
        recalls.append(float(np.mean(preds[mask] == c)))
    if not recalls:
        return 0.0
    return float(np.mean(recalls))


def topk_accuracy(probs, target, k):
    """probs: [N, C] scores; hit if target within top-k columns."""
    probs = np.asarray(probs)
    target = np.asarray(target)
    if probs.size == 0:
        return 0.0
    k = min(k, probs.shape[1])
    topk = np.argsort(-probs, axis=1)[:, :k]
    return float(np.mean([t in row for t, row in zip(target, topk)]))


def per_class_accuracy(preds, target, num_classes):
    """Recall per class; 0 where the class has no support."""
    preds = np.asarray(preds)
    target = np.asarray(target)
    out = np.zeros(num_classes)
    for c in range(num_classes):
        mask = target == c
        if mask.sum():
            out[c] = np.mean(preds[mask] == c)
    return out


def per_class_precision(preds, target, num_classes):
    preds = np.asarray(preds)
    target = np.asarray(target)
    out = np.zeros(num_classes)
    for c in range(num_classes):
        mask = preds == c
        if mask.sum():
            out[c] = np.mean(target[mask] == c)
    return out


def confusion_matrix(preds, target, num_classes):
    preds = np.asarray(preds)
    target = np.asarray(target)
    mat = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(mat, (target, preds), 1)
    return mat


class MetricCollection:
    """Streaming micro/macro/top-k collection over batches."""

    def __init__(self, num_classes, top_k=None):
        self.num_classes = num_classes
        self.top_k = top_k
        self.reset()

    def reset(self):
        self._preds = []
        self._targets = []
        self._probs = []

    def update(self, probs, target):
        probs = np.asarray(probs)
        self._probs.append(probs)
        self._preds.append(np.argmax(probs, axis=1))
        self._targets.append(np.asarray(target))

    def compute(self):
        if not self._preds:
            return {}
        preds = np.concatenate(self._preds)
        target = np.concatenate(self._targets)
        probs = np.concatenate(self._probs)
        out = {
            "Micro Accuracy": micro_accuracy(preds, target),
            "Macro Accuracy": macro_accuracy(preds, target, self.num_classes),
        }
        if self.top_k:
            out["Top {} Accuracy".format(self.top_k)] = topk_accuracy(probs, target, self.top_k)
        return out
