"""Stage-3 augmentation transforms: box/mask consistency under every
geometric transform, point-sampling invariants, fixed-shape padding."""

import numpy as np

from efficientsam3_tpu.data import transforms as T


def _sample(seed=0, h=96, w=128, n=3):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    masks = np.zeros((n, h, w), bool)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        y0 = int(rng.integers(0, h - 24))
        x0 = int(rng.integers(0, w - 24))
        bh = int(rng.integers(12, 24))
        bw = int(rng.integers(12, 24))
        masks[i, y0 : y0 + bh, x0 : x0 + bw] = True
        boxes[i] = [x0, y0, x0 + bw, y0 + bh]
    return {"image": img, "boxes": boxes, "masks": masks}


def _boxes_from_masks(masks):
    out = []
    for m in masks:
        ys, xs = np.nonzero(m)
        out.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    return np.asarray(out, np.float32)


def _assert_consistent(s, atol):
    """Transformed boxes must still bound the transformed masks."""
    if not len(s["boxes"]):
        return
    from_masks = _boxes_from_masks(s["masks"])
    np.testing.assert_allclose(s["boxes"], from_masks, atol=atol)


def test_hflip_consistency():
    s = _sample()
    f = T.hflip(s)
    _assert_consistent(f, atol=1e-6)
    assert np.array_equal(T.hflip(f)["image"], s["image"])  # involution


def test_resize_consistency():
    s = _sample()
    r = T.resize(s, 64)
    assert min(r["image"].shape[:2]) == 64
    _assert_consistent(r, atol=2.0)  # mask re-rasterization tolerance
    sq = T.resize(s, 80, square=True)
    assert sq["image"].shape[:2] == (80, 80)
    _assert_consistent(sq, atol=2.0)


def test_crop_clamps_and_filters():
    s = _sample()
    c = T.crop(s, 10, 20, 60, 70)
    assert c["image"].shape[:2] == (60, 70)
    assert len(c["boxes"]) == len(c["masks"])
    _assert_consistent(c, atol=1.5)
    # boxes stay inside the crop
    assert (c["boxes"][:, 0::2] <= 70).all() and (c["boxes"][:, 1::2] <= 60).all()


def test_large_scale_jitter_shapes():
    rng = np.random.default_rng(3)
    for seed in range(4):
        s = _sample(seed)
        j = T.large_scale_jitter(s, rng, out_size=96)
        assert j["image"].shape[:2] == (96, 96)
        if len(j["boxes"]):
            assert len(j["boxes"]) == len(j["masks"])
            _assert_consistent(j, atol=2.5)


def test_point_sampling():
    rng = np.random.default_rng(0)
    s = _sample()
    m = s["masks"][0]
    pts = T.uniform_positive_sample(m, 8, rng)
    assert pts.shape == (8, 3)
    assert all(m[int(y), int(x)] for x, y, _ in pts)
    cpts = T.center_positive_sample(m, 2)
    assert all(m[int(y), int(x)] for x, y, _ in cpts)
    bpts = T.uniform_sample_from_box(m, s["boxes"][0], 16, rng)
    for x, y, lab in bpts:
        assert lab == m[int(y) if y < m.shape[0] else -1, int(x) if x < m.shape[1] else -1]


def test_randomize_box_stays_inside():
    rng = np.random.default_rng(1)
    for _ in range(20):
        b = T.randomize_box(np.asarray([10.0, 10.0, 50.0, 40.0]), rng, (96, 128))
        assert 0 <= b[0] <= b[2] <= 128 and 0 <= b[1] <= b[3] <= 96


def test_pipeline_and_pad_to_fixed():
    rng = np.random.default_rng(5)
    s = _sample()
    aug = T.stage3_train_augment(s, rng, image_size=96)
    fin = T.pad_to_fixed(T.normalize(aug), max_targets=8, mask_size=32)
    assert fin["image"].shape == (96, 96, 3)
    assert fin["boxes"].shape == (8, 4) and fin["valid"].shape == (8,)
    assert fin["masks"].shape == (8, 32, 32)
    n = int(fin["valid"].sum())
    if n:
        assert (fin["boxes"][:n, 2:] > 0).all()  # normalized w/h positive
        assert (fin["boxes"][:n] <= 1.0 + 1e-6).all()
    assert not fin["valid"][n:].any()
