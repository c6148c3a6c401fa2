"""Mask/box utilities: IoU matrices, masks->boxes, greedy mask NMS.

Replaces the reference perflib (sam3/sam3/perflib/masks_ops.py:6,51,
perflib/nms.py:23,56, perflib/triton/nms.py) with TPU-first formulations:

  - mask_iou: the boolean-intersection matrix is one (N, HW) x (HW, M)
    matmul on the MXU (fp32 accumulate) instead of the reference's
    broadcasted boolean AND reduction — O(N*M*HW) FLOPs ride the systolic
    array at bf16-ready layouts.
  - greedy NMS over a precomputed IoU matrix: a lax.fori_loop over the
    score-sorted candidates with a running suppression mask — the data
    dependence is inherent to greedy NMS (same as the reference's Triton
    kernel loop), but each step is a vectorized row update.
  - masks_to_boxes: arg-reductions over axis projections.

All functions are jittable with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def mask_intersection_matrix(a, b):
    """a: (N, H, W) bool/float, b: (M, H, W) -> (N, M) intersection areas."""
    n = a.shape[0]
    m = b.shape[0]
    af = a.reshape(n, -1).astype(jnp.float32)
    bf = b.reshape(m, -1).astype(jnp.float32)
    return jnp.einsum("nk,mk->nm", af, bf, preferred_element_type=jnp.float32)


def mask_iou(a, b, eps: float = 1e-6):
    """(N, M) IoU matrix between boolean mask sets (masks_ops.py:51)."""
    inter = mask_intersection_matrix(a, b)
    area_a = a.reshape(a.shape[0], -1).astype(jnp.float32).sum(-1)
    area_b = b.reshape(b.shape[0], -1).astype(jnp.float32).sum(-1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, eps)


def masks_to_boxes(masks):
    """(N, H, W) bool -> (N, 4) xyxy; empty masks give zeros
    (masks_ops.py:6 / box_ops.py:61)."""
    n, h, w = masks.shape
    m = masks.astype(jnp.bool_)
    any_y = m.any(axis=2)  # (N, H)
    any_x = m.any(axis=1)  # (N, W)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    big = jnp.float32(1e9)
    y0 = jnp.min(jnp.where(any_y, ys, big), axis=1)
    y1 = jnp.max(jnp.where(any_y, ys, -big), axis=1)
    x0 = jnp.min(jnp.where(any_x, xs, big), axis=1)
    x1 = jnp.max(jnp.where(any_x, xs, -big), axis=1)
    nonempty = m.any(axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where(nonempty[:, None], boxes, 0.0)


def box_iou_xyxy(a, b, eps: float = 1e-6):
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, eps)


def generalized_box_iou(a, b, eps: float = 1e-6):
    """GIoU matrix (box_ops.py, used by matcher/losses)."""
    iou = box_iou_xyxy(a, b, eps)
    tl = jnp.minimum(a[:, None, :2], b[None, :, :2])
    br = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    inter_wh = jnp.clip(
        jnp.minimum(a[:, None, 2:], b[None, :, 2:])
        - jnp.maximum(a[:, None, :2], b[None, :, :2]),
        0.0,
    )
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return iou - (hull - union) / jnp.maximum(hull, eps)


@functools.partial(jax.jit, static_argnums=())
def greedy_nms_from_iou(iou, scores, iou_threshold: float = 0.5):
    """Greedy NMS given a full (N, N) IoU matrix and scores.

    Returns keep: (N,) bool. Matches the reference's generic NMS semantics
    (perflib/nms.py:23): process in descending score order; keep a candidate
    iff no higher-scoring kept candidate overlaps above threshold.
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    iou_sorted = iou[order][:, order]  # (N, N) in rank order

    def body(i, keep):
        # suppressed if any kept earlier candidate overlaps > threshold
        overlap = (iou_sorted[i] > iou_threshold) & keep
        sup = jnp.any(overlap & (jnp.arange(n) < i))
        return keep.at[i].set(~sup)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_masks(masks, scores, iou_threshold: float = 0.5):
    """Mask NMS (perflib/nms.py:56 nms_masks): IoU matrix on MXU + greedy."""
    iou = mask_iou(masks, masks)
    return greedy_nms_from_iou(iou, scores, iou_threshold)


def nms_boxes(boxes_xyxy, scores, iou_threshold: float = 0.5):
    return greedy_nms_from_iou(box_iou_xyxy(boxes_xyxy, boxes_xyxy), scores, iou_threshold)
