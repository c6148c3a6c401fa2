"""Tests for mask ops / NMS / EDT / CCL / focal loss vs numpy+scipy oracles.

The reference's kernel-fallback pairs (SURVEY §4) become real parity tests:
CPU scipy/numpy is the oracle, the jitted TPU formulation is the target.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi
import torch

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.cc import connected_components, fill_holes_in_mask_scores
from efficientsam3_tpu.ops.edt import edt
from efficientsam3_tpu.ops.focal_loss import dice_loss, sigmoid_focal_loss
from efficientsam3_tpu.ops.masks import (
    box_iou_xyxy,
    generalized_box_iou,
    greedy_nms_from_iou,
    mask_iou,
    masks_to_boxes,
    nms_masks,
)

RNG = np.random.default_rng(11)


def test_mask_iou_and_boxes():
    a = RNG.random((4, 16, 16)) > 0.6
    b = RNG.random((3, 16, 16)) > 0.6
    got = np.asarray(mask_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.zeros((4, 3))
    for i in range(4):
        for j in range(3):
            inter = (a[i] & b[j]).sum()
            union = (a[i] | b[j]).sum()
            want[i, j] = inter / max(union, 1e-6)
    np.testing.assert_allclose(got, want, atol=1e-5)

    boxes = np.asarray(masks_to_boxes(jnp.asarray(a)))
    for i in range(4):
        ys, xs = np.nonzero(a[i])
        if len(ys):
            np.testing.assert_allclose(
                boxes[i], [xs.min(), ys.min(), xs.max(), ys.max()]
            )


def test_greedy_nms_matches_reference_loop():
    n = 24
    boxes = RNG.random((n, 2)) * 20
    boxes = np.concatenate([boxes, boxes + 5 + RNG.random((n, 2)) * 10], -1).astype(
        np.float32
    )
    scores = RNG.random(n).astype(np.float32)
    iou = np.asarray(box_iou_xyxy(jnp.asarray(boxes), jnp.asarray(boxes)))
    # reference-style greedy loop (perflib/nms.py CPU fallback semantics)
    order = np.argsort(-scores)
    keep_ref = np.zeros(n, bool)
    for i in order:
        ok = True
        for j in range(n):
            if keep_ref[j] and scores[j] > scores[i] and iou[i, j] > 0.5:
                ok = False
        keep_ref[i] = ok
    got = np.asarray(greedy_nms_from_iou(jnp.asarray(iou), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(got, keep_ref)


def test_edt_matches_scipy():
    m = RNG.random((24, 31)) > 0.35
    m[0, 0] = False  # ensure at least one background pixel
    got = np.asarray(edt(jnp.asarray(m), chunk=8))
    want = ndi.distance_transform_edt(m)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_edt_all_foreground_row():
    m = np.ones((8, 8), bool)
    m[4, 4] = False
    got = np.asarray(edt(jnp.asarray(m), chunk=4))
    want = ndi.distance_transform_edt(m)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_connected_components_matches_scipy():
    m = RNG.random((32, 32)) > 0.55
    got = np.asarray(connected_components(jnp.asarray(m)))
    want, n_ref = ndi.label(m, structure=np.ones((3, 3)))
    # same partition: bijection between label sets
    assert (got > 0).sum() == (want > 0).sum()
    pairs = set(zip(got[m].tolist(), want[m].tolist()))
    assert len(pairs) == n_ref  # one-to-one
    assert len({p[0] for p in pairs}) == n_ref
    assert len({p[1] for p in pairs}) == n_ref


def test_fill_holes():
    scores = np.full((16, 16), 5.0, np.float32)
    scores[4:6, 4:6] = -3.0  # small hole (4 px)
    scores[10:16, 10:16] = -3.0  # big region (36 px)
    out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(scores), max_hole_area=8))
    assert (out[4:6, 4:6] == 0.1).all()
    assert (out[10:16, 10:16] == -3.0).all()


def test_focal_loss_matches_torch():
    logits = RNG.standard_normal((40,)).astype(np.float32) * 3
    targets = (RNG.random(40) > 0.5).astype(np.float32)
    lt = torch.from_numpy(logits).requires_grad_(True)
    tt = torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    want = ce * (1 - p_t) ** 2.0
    want = (0.25 * tt + 0.75 * (1 - tt)) * want
    want.sum().backward()

    fn = jax.jit(lambda lg: sigmoid_focal_loss(lg, jnp.asarray(targets)).sum())
    got = fn(jnp.asarray(logits))
    np.testing.assert_allclose(float(got), float(want.sum()), rtol=1e-5)
    ggrad = np.asarray(jax.grad(fn)(jnp.asarray(logits)))
    np.testing.assert_allclose(ggrad, lt.grad.numpy(), atol=1e-5)


def test_focal_loss_saturated_grad_finite():
    """Saturated logits (p_t == 1.0 exactly in fp32) must give finite grads.

    gamma=0 (the presence-loss config) used to produce 0 * one_m**(-1) =
    0 * inf = NaN in the custom backward — the deterministic grad-NaN that
    killed the stage-3 overfit run at step 450. gamma in (0, 2) exercises
    the one_m**(gamma-1) guard."""
    logits = jnp.asarray([40.0, -40.0, 17.5, 0.3, -17.5], jnp.float32)
    targets = jnp.asarray([1.0, 0.0, 1.0, 1.0, 0.0], jnp.float32)
    for gamma in (0.0, 0.5, 1.6, 2.0):
        fn = jax.jit(
            lambda lg, g=gamma: sigmoid_focal_loss(lg, targets, 0.5, g).sum()
        )
        grad = np.asarray(jax.grad(fn)(logits))
        assert np.isfinite(grad).all(), (gamma, grad)
        # backward must still match torch autograd away from saturation
        lt = torch.from_numpy(np.asarray(logits)).requires_grad_(True)
        tt = torch.from_numpy(np.asarray(targets))
        p = torch.sigmoid(lt)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            lt, tt, reduction="none"
        )
        p_t = p * tt + (1 - p) * (1 - tt)
        want = (0.5 * tt + 0.5 * (1 - tt)) * ce * (1 - p_t) ** gamma
        want.sum().backward()
        tg = lt.grad.numpy()
        ok = np.isfinite(tg)  # torch itself NaNs at the saturated entries
        np.testing.assert_allclose(grad[ok], tg[ok], atol=1e-6)


def test_dice_loss():
    logits = jnp.asarray(RNG.standard_normal((2, 8, 8)).astype(np.float32))
    targets = jnp.asarray((RNG.random((2, 8, 8)) > 0.5).astype(np.float32))
    out = np.asarray(dice_loss(logits, targets))
    assert out.shape == (2,)
    assert (out >= 0).all() and (out <= 1).all()
