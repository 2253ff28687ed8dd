"""Metric tests: classification metrics vs hand counts, ecology metrics on
toy lists (pattern: reference tests/test_metrics.py)."""
import numpy as np

from deeptreeattention_tpu.train import metrics as M
from deeptreeattention_tpu.train.ecology import genus_confusion, site_confusion


def test_micro_macro():
    preds = np.array([0, 0, 1, 1, 2])
    target = np.array([0, 1, 1, 1, 0])
    assert M.micro_accuracy(preds, target) == 0.6
    # class recalls: c0: 1/2, c1: 2/3, c2 absent -> macro over present = (0.5 + 2/3)/2
    assert abs(M.macro_accuracy(preds, target, 3) - (0.5 + 2 / 3) / 2) < 1e-9


def test_topk():
    probs = np.array([[0.5, 0.3, 0.2], [0.1, 0.2, 0.7]])
    target = np.array([1, 0])
    assert M.topk_accuracy(probs, target, 1) == 0.0
    assert M.topk_accuracy(probs, target, 2) == 0.5
    assert M.topk_accuracy(probs, target, 3) == 1.0


def test_per_class_vectors():
    preds = np.array([0, 1, 1])
    target = np.array([0, 0, 1])
    acc = M.per_class_accuracy(preds, target, 3)
    prec = M.per_class_precision(preds, target, 3)
    np.testing.assert_allclose(acc, [0.5, 1.0, 0.0])
    np.testing.assert_allclose(prec, [1.0, 0.5, 0.0])


def test_confusion_matrix():
    mat = M.confusion_matrix(np.array([0, 1, 1]), np.array([0, 0, 1]), 2)
    np.testing.assert_array_equal(mat, [[1, 1], [0, 1]])


def test_site_confusion():
    site_lists = {"A": ["s1"], "B": ["s1", "s2"], "C": ["s3"]}
    # A->B misclass co-occur at s1 (within); A->C cross
    assert site_confusion(["A", "A"], ["B", "C"], site_lists) == 0.5
    assert site_confusion(["A"], ["A"], site_lists) == 0


def test_genus_confusion():
    sci = {"QULA2": ["Quercus laevis"], "QUGE2": ["Quercus geminata"], "PITA": ["Pinus taeda"]}
    assert genus_confusion(["QULA2", "QULA2"], ["QUGE2", "PITA"], sci) == 0.5
    assert genus_confusion(["PITA"], ["PITA"], sci) == 0
