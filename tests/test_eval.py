"""Evaluator tests: RLE roundtrip, cgF1 semantics, mAP sanity."""

import numpy as np

from efficientsam3_tpu.eval.cgf1 import CGF1Evaluator
from efficientsam3_tpu.eval.coco_format import (
    mask_iou_np,
    mask_to_rle,
    polygons_to_mask,
    rle_decode_string,
    rle_encode_string,
    rle_to_mask,
)
from efficientsam3_tpu.eval.coco_map import CocoMAPEvaluator

RNG = np.random.default_rng(7)


def test_rle_roundtrip():
    m = RNG.random((23, 31)) > 0.5
    rle = mask_to_rle(m)
    np.testing.assert_array_equal(rle_to_mask(rle), m)
    # compressed-string roundtrip
    s = rle_encode_string(rle["counts"])
    np.testing.assert_array_equal(rle_decode_string(s), rle["counts"])
    np.testing.assert_array_equal(
        rle_to_mask({"size": rle["size"], "counts": s}), m
    )


def test_polygon_rasterize():
    m = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert m[5, 5] and not m[0, 0]
    assert m.sum() >= 64  # at least the 8x8 interior


def test_cgf1_perfect_predictions():
    ev = CGF1Evaluator()
    for _ in range(10):
        gt = RNG.random((2, 16, 16)) > 0.5
        ev.add_masks(gt.copy(), gt)  # perfect detections
    for _ in range(5):
        ev.add_masks(np.zeros((0, 16, 16), bool), np.zeros((0, 16, 16), bool))
    out = ev.summarize()
    assert out["cgF1"] > 0.97
    assert out["IL_MCC"] > 0.99


def test_cgf1_penalizes_false_positives_on_empty():
    ev = CGF1Evaluator()
    for _ in range(10):
        gt = RNG.random((2, 16, 16)) > 0.5
        ev.add_masks(gt.copy(), gt)
    # false positives on negative images crush IL_MCC
    for _ in range(10):
        ev.add_masks(RNG.random((1, 16, 16)) > 0.5, np.zeros((0, 16, 16), bool))
    out = ev.summarize()
    assert out["cgF1"] < 0.2


def test_coco_map_perfect_and_shifted():
    ev = CocoMAPEvaluator("bbox")
    boxes = np.asarray([[10, 10, 20, 20], [40, 40, 10, 10]], np.float64)
    for _ in range(5):
        ev.add_image(1, [0.9, 0.8], boxes, boxes)
    out = ev.summarize()
    assert out["AP"] > 0.99

    ev2 = CocoMAPEvaluator("bbox")
    shifted = boxes + np.asarray([8, 8, 0, 0])
    for _ in range(5):
        ev2.add_image(1, [0.9, 0.8], shifted, boxes)
    out2 = ev2.summarize()
    assert out2["AP50"] > out2.get("AP75", 0) or out2["AP"] < out["AP"]


def test_coco_map_segm():
    ev = CocoMAPEvaluator("segm")
    gt = RNG.random((3, 24, 24)) > 0.6
    ev.add_image(1, [0.9, 0.8, 0.7], gt.copy(), gt)
    assert ev.summarize()["AP"] > 0.99


def test_coco_map_iscrowd_ignored():
    """A detection matching a crowd gt is ignored - neither TP nor FP
    (pycocotools evaluateImg crowd semantics)."""
    gts = np.asarray(
        [[0, 0, 10, 10], [50, 50, 20, 20], [0, 0, 100, 100]], np.float64
    )
    crowd = np.asarray([False, False, True])
    dts = np.asarray(
        [[20, 20, 30, 30], [0, 0, 10, 10], [50, 50, 20, 20]], np.float64
    )
    scores = [0.95, 0.9, 0.8]  # the crowd-covered det outranks the true ones
    ev = CocoMAPEvaluator("bbox")
    ev.add_image(1, scores, dts, gts, gt_iscrowd=crowd)
    out = ev.summarize()
    # with crowd ignoring, the two true dets are rank-consecutive TPs -> AP 1
    assert abs(out["AP"] - 1.0) < 1e-9, out

    # without the crowd flag the first det is a hard FP and AP drops
    ev2 = CocoMAPEvaluator("bbox")
    ev2.add_image(1, scores, dts, gts[:2])
    assert ev2.summarize()["AP"] < 1.0


def test_coco_map_area_ranges_and_maxdets():
    gts = np.asarray([[0, 0, 10, 10], [50, 50, 20, 20]], np.float64)  # small
    dts = gts.copy()
    ev = CocoMAPEvaluator("bbox")
    ev.add_image(1, [0.9, 0.8], dts, gts)
    out = ev.summarize()
    assert abs(out["AP_small"] - 1.0) < 1e-9
    assert np.isnan(out["AP_medium"]) and np.isnan(out["AP_large"])
    assert abs(out["AR@1"] - 0.5) < 1e-9  # only one det kept at maxDet=1
    assert abs(out["AR@10"] - 1.0) < 1e-9
    assert abs(out["AR@100"] - 1.0) < 1e-9


def test_coco_map_unmatched_det_outside_range_ignored():
    """An unmatched LARGE detection must not count as FP for the small
    range (pycocotools accumulate dtIg logic)."""
    gts = np.asarray([[0, 0, 10, 10]], np.float64)  # small, area 100
    dts = np.asarray([[200, 200, 200, 200], [0, 0, 10, 10]], np.float64)
    ev = CocoMAPEvaluator("bbox")
    ev.add_image(1, [0.95, 0.9], dts, gts)
    out = ev.summarize()
    assert abs(out["AP_small"] - 1.0) < 1e-9, out
    assert out["AP"] < 1.0  # in 'all', the big det is a real FP


def test_coco_map_vs_recorded_pycocotools():
    """Cross-check against an ORACLE fixture. The checked-in fixture is
    derived analytically — every IoU an exact rational strictly between
    the 0.5:0.05:0.95 thresholds, AP/AR computed on paper following the
    pycocotools algorithm (full derivation in
    scripts/make_pycoco_analytic_fixture.py). When an environment with
    pycocotools exists, scripts/make_pycoco_fixture.py re-records the same
    file from the real library. Reference oracle:
    sam3/sam3/eval/coco_eval.py:42."""
    import json
    import os

    import pytest

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "pycoco_oracle.json"
    )
    if not os.path.exists(path):
        pytest.skip("recorded pycocotools fixture not generated yet")
    fx = json.load(open(path))

    from efficientsam3_tpu.eval.coco_format import rle_to_mask
    from efficientsam3_tpu.eval.coco_map import CocoMAPEvaluator

    ev = CocoMAPEvaluator("segm")
    gt_by_img = {}
    for a in fx["gt"]["annotations"]:
        gt_by_img.setdefault(a["image_id"], []).append(a)
    dt_by_img = {}
    for d in fx["dt"]:
        dt_by_img.setdefault(d["image_id"], []).append(d)
    for img in fx["gt"]["images"]:
        gts = gt_by_img.get(img["id"], [])
        dts = dt_by_img.get(img["id"], [])
        ev.add_image(
            1,
            [d["score"] for d in dts],
            np.stack([rle_to_mask(d["segmentation"]) for d in dts]),
            np.stack([rle_to_mask(g["segmentation"]) for g in gts]),
            gt_iscrowd=[g["iscrowd"] for g in gts],
            gt_areas=[g["area"] for g in gts],
        )
    m = ev.summarize()
    for k, v in fx["metrics"].items():
        if k in m:
            np.testing.assert_allclose(m[k], v, atol=1e-6, err_msg=k)
