"""HOTA metric sanity."""

import numpy as np

from efficientsam3_tpu.eval.hota import HOTAEvaluator


def test_perfect_tracking():
    ev = HOTAEvaluator()
    for t in range(5):
        ev.add_frame([1, 2], [10, 20], np.eye(2) * 0.95)
    out = ev.summarize()
    assert out["HOTA"] > 0.99
    assert out["DetA"] > 0.99 and out["AssA"] > 0.99


def test_identity_switch_hurts_assa_not_deta():
    # detections perfect every frame, but the predicted identity flips
    # halfway -> DetA stays 1, AssA drops, HOTA in between
    ev = HOTAEvaluator()
    for t in range(10):
        pred = [10] if t < 5 else [20]
        ev.add_frame([1], pred, np.asarray([[0.9]]))
    out = ev.summarize()
    # IoU 0.9 fails the strictest alphas, so DetA is slightly below 1
    assert out["DetA"] > 0.9
    assert out["AssA"] < 0.6
    assert 0.4 < out["HOTA"] < 0.8


def test_missed_and_false_detections():
    ev = HOTAEvaluator()
    for t in range(4):
        ev.add_frame([1], [], np.zeros((1, 0)))  # all missed
    for t in range(4):
        ev.add_frame([], [99], np.zeros((0, 1)))  # all false
    out = ev.summarize()
    assert out["HOTA"] == 0.0 and out["DetA"] == 0.0
