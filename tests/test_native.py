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
