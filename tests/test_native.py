"""Native C++ host kernels vs scipy/jax oracles."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from efficientsam3_tpu import native

pytestmark = pytest.mark.skipif(native.lib() is None, reason="no g++ available")

RNG = np.random.default_rng(5)


def test_native_cc_matches_scipy():
    m = RNG.random((48, 64)) > 0.55
    labels, n = native.cc_label(m)
    want, n_ref = ndi.label(m, structure=np.ones((3, 3)))
    assert n == n_ref
    pairs = set(zip(labels[m].tolist(), want[m].tolist()))
    assert len(pairs) == n_ref


def test_native_edt_matches_scipy():
    m = RNG.random((40, 52)) > 0.3
    m[0, 0] = False
    got = native.edt(m)
    want = ndi.distance_transform_edt(m)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_native_nms_matches_jax_op():
    import jax.numpy as jnp

    from efficientsam3_tpu.ops.masks import box_iou_xyxy, greedy_nms_from_iou

    n = 30
    boxes = RNG.random((n, 2)) * 20
    boxes = np.concatenate([boxes, boxes + 3 + RNG.random((n, 2)) * 8], -1).astype(
        np.float32
    )
    scores = RNG.random(n).astype(np.float32)
    iou = np.asarray(box_iou_xyxy(jnp.asarray(boxes), jnp.asarray(boxes)))
    want = np.asarray(greedy_nms_from_iou(jnp.asarray(iou), jnp.asarray(scores), 0.5))
    got = native.nms_greedy(iou, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_record_store_roundtrip(tmp_path):
    items = [bytes([i] * 32) for i in range(5)]
    p = str(tmp_path / "store.bin")
    native.RecordStore.write(p, items)
    rs = native.RecordStore(p)
    assert rs.count == 5 and rs.item_size == 32
    assert rs.read(3) == items[3]
    with pytest.raises(IOError):
        rs.read(99)


def _fill_holes_scipy(scores, max_area, remove_sprinkles):
    """Independent scipy oracle for fill_holes_sprinkles (reference
    sam3_tracker_utils.py:392 semantics)."""
    out = scores.copy()
    eight = np.ones((3, 3), int)
    for sl in out.reshape(-1, *out.shape[-2:]):
        bg = sl <= 0
        labels, n = ndi.label(bg, structure=eight)
        if n:
            areas = np.bincount(labels.ravel(), minlength=n + 1)
            areas[0] = 0
            sl[(areas[labels] > 0) & (areas[labels] <= max_area)] = 0.1
        if remove_sprinkles:
            fg = sl > 0
            labels, n = ndi.label(fg, structure=eight)
            if n:
                thresh = min(int(fg.sum()) // 2, int(max_area))
                areas = np.bincount(labels.ravel(), minlength=n + 1)
                areas[0] = 0
                sl[(areas[labels] > 0) & (areas[labels] <= thresh)] = -0.1
    return out


@pytest.mark.parametrize("remove_sprinkles", [False, True])
def test_native_fill_holes_noise_parity(remove_sprinkles):
    # worst case: pure noise masks maximize the run count
    scores = (RNG.random((8, 288, 288)).astype(np.float32) - 0.5) * 4
    want = _fill_holes_scipy(scores, 16, remove_sprinkles)
    got = native.fill_holes(
        np.ascontiguousarray(scores.copy()), 16.0,
        remove_sprinkles=remove_sprinkles,
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("remove_sprinkles", [False, True])
def test_native_fill_holes_structured_parity(remove_sprinkles):
    # typical case: large blobs with small holes + sprinkles
    scores = np.full((8, 288, 288), -2.0, np.float32)
    for b in range(8):
        y, x = np.mgrid[:288, :288]
        cy, cx, r = 60 + 20 * b, 144, 70 + 3 * b
        blob = (y - cy) ** 2 + (x - cx) ** 2 < r * r
        scores[b][blob] = 3.0
        # punch small holes inside the blob
        for k in range(5):
            hy, hx = cy + 10 * k - 20, cx + 6 * k - 12
            scores[b][hy : hy + 3, hx : hx + 3] = -1.0
        # sprinkles far from the blob
        for k in range(4):
            sy, sx = (37 * (b + k + 1)) % 280, (53 * (b + 2 * k + 1)) % 280
            scores[b][sy : sy + 2, sx : sx + 2] = 1.0
    want = _fill_holes_scipy(scores, 16, remove_sprinkles)
    got = native.fill_holes(
        np.ascontiguousarray(scores.copy()), 16.0,
        remove_sprinkles=remove_sprinkles,
    )
    np.testing.assert_array_equal(got, want)


def test_device_fill_holes_sprinkles_matches_host():
    import jax.numpy as jnp

    from efficientsam3_tpu.ops.cc import (
        fill_holes_in_mask_scores,
        fill_holes_in_mask_scores_host,
    )

    scores = (RNG.random((64, 64)).astype(np.float32) - 0.45) * 4
    dev = np.asarray(
        fill_holes_in_mask_scores(jnp.asarray(scores), 12, remove_sprinkles=True)
    )
    host = fill_holes_in_mask_scores_host(scores, 12, remove_sprinkles=True)
    np.testing.assert_array_equal(dev, host)
