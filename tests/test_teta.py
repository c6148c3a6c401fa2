"""TETA metric sanity."""

import numpy as np

from efficientsam3_tpu.eval.teta import TETAEvaluator


def test_perfect():
    ev = TETAEvaluator()
    for _ in range(5):
        ev.add_frame([1, 2], [10, 20], np.eye(2) * 0.9)
    out = ev.summarize()
    assert out["TETA"] > 0.99
    assert out["LocA"] > 0.99 and out["AssocA"] > 0.99 and out["ClsA"] > 0.99


def test_id_switch_hits_assoc_only():
    ev = TETAEvaluator()
    for t in range(10):
        ev.add_frame([1], [10 if t < 5 else 20], np.asarray([[0.9]]))
    out = ev.summarize()
    assert out["LocA"] > 0.99 and out["ClsA"] > 0.99
    assert out["AssocA"] < 0.6


def test_misclassification_hits_clsa_only():
    ev = TETAEvaluator()
    for _ in range(5):
        ev.add_frame([1], [10], np.asarray([[0.9]]), gt_classes=[3], pred_classes=[7])
    out = ev.summarize()
    assert out["LocA"] > 0.99 and out["AssocA"] > 0.99
    assert out["ClsA"] == 0.0
    assert abs(out["TETA"] - 2.0 / 3.0) < 1e-6


def test_empty_frames():
    ev = TETAEvaluator()
    ev.add_frame([1], [], np.zeros((1, 0)))
    ev.add_frame([], [9], np.zeros((0, 1)))
    out = ev.summarize()
    assert out["TETA"] == 0.0
