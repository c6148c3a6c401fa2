"""Click sampling from error regions (EDT-backed)."""

import numpy as np

from efficientsam3_tpu.video.click_sampling import (
    sample_box_points,
    sample_center_point_from_errors,
    sample_random_points_from_errors,
)


def test_box_points():
    m = np.zeros((32, 32), bool)
    m[8:20, 10:25] = True
    pts, labels = sample_box_points(m, noise_std=0.0)
    np.testing.assert_allclose(pts, [[10, 8], [24, 19]])
    assert labels.tolist() == [2, 3]


def test_error_point_sampling():
    gt = np.zeros((32, 32), bool)
    gt[5:15, 5:15] = True
    pred = np.zeros((32, 32), bool)
    pred[10:20, 10:20] = True
    rng = np.random.default_rng(0)
    pts, labels = sample_random_points_from_errors(gt, pred, 10, rng)
    for (x, y), lab in zip(pts.astype(int), labels):
        fn = gt[y, x] and not pred[y, x]
        fp = pred[y, x] and not gt[y, x]
        assert fn or fp
        assert lab == int(fn)


def test_center_point_is_deep_in_error():
    gt = np.zeros((32, 32), bool)
    gt[4:20, 4:20] = True
    pred = np.zeros((32, 32), bool)  # everything missed -> FN square
    pts, labels = sample_center_point_from_errors(gt, pred)
    x, y = pts[0].astype(int)
    # center of the FN square is its deepest point
    assert 10 <= x <= 13 and 10 <= y <= 13
    assert labels[0] == 1
    # no errors -> padding point
    pts2, labels2 = sample_center_point_from_errors(gt, gt)
    assert labels2[0] == -1
