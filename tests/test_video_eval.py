"""Video-eval harness: pipeline-format records -> HOTA/TETA/J&F."""

import numpy as np


def _square(t, size=64, off=0):
    m = np.zeros((size, size), bool)
    m[10 + t + off : 30 + t + off, 10 + t : 30 + t] = True
    return m


def _frames(n, ids=(1, 2), off=0):
    out = []
    for t in range(n):
        masks = np.stack([_square(t, off=off), _square(t, off=off + 25)])
        out.append({"obj_ids": list(ids), "masks": masks[: len(ids)]})
    return out


def test_perfect_predictions_score_one():
    from efficientsam3_tpu.eval.video_eval import evaluate_video_predictions

    gt = _frames(6)
    pred = _frames(6, ids=(7, 9))  # different ids, same masks
    m = evaluate_video_predictions(pred, gt)
    assert m["HOTA"] > 0.99 and m["J&F"] > 0.99
    assert m["TETA"] > 0.99


def test_degraded_predictions_score_lower():
    from efficientsam3_tpu.eval.video_eval import evaluate_video_predictions

    gt = _frames(6)
    # shifted masks + an id switch halfway through
    pred = []
    for t in range(6):
        ids = (7, 9) if t < 3 else (8, 9)
        masks = np.stack([_square(t, off=6), _square(t, off=31)])
        pred.append({"obj_ids": list(ids), "masks": masks})
    m = evaluate_video_predictions(pred, gt)
    assert m["HOTA"] < 0.9
    assert m["J&F"] < 0.9


def test_accumulation_across_videos():
    from efficientsam3_tpu.eval.hota import HOTAEvaluator
    from efficientsam3_tpu.eval.teta import TETAEvaluator
    from efficientsam3_tpu.eval.video_eval import evaluate_video_predictions

    hota, teta = HOTAEvaluator(), TETAEvaluator()
    for _ in range(2):
        out = evaluate_video_predictions(
            _frames(4, ids=(5,)), _frames(4, ids=(1,)), hota, teta
        )
        assert "J&F" in out and "HOTA" not in out  # deferred summarize
    agg = hota.summarize()
    assert agg["HOTA"] > 0.99
