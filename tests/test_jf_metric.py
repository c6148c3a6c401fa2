"""J&F metric sanity."""

import numpy as np

from efficientsam3_tpu.eval.jf_metric import evaluate_vos, f_measure, j_measure


def _disk(h, w, cx, cy, r):
    yy, xx = np.mgrid[:h, :w]
    return (xx - cx) ** 2 + (yy - cy) ** 2 < r * r


def test_perfect_prediction():
    gt = {1: np.stack([_disk(64, 64, 30, 30, 10)] * 3)}
    out = evaluate_vos(gt, gt)
    assert out["J"] == 1.0 and out["F"] == 1.0 and out["J&F"] == 1.0


def test_shifted_prediction_degrades():
    g = _disk(64, 64, 30, 30, 10)
    p = _disk(64, 64, 34, 30, 10)
    assert 0.3 < j_measure(p, g) < 0.9
    assert f_measure(p, g) < 1.0
    out = evaluate_vos({1: p[None]}, {1: g[None]})
    assert 0 < out["J&F"] < 1

    missed = evaluate_vos({1: np.zeros((1, 64, 64), bool)}, {1: g[None]})
    assert missed["J"] == 0.0 and missed["F"] == 0.0
