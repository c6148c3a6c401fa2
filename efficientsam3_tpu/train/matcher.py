"""Hungarian matching for DETR-style training.

Mirrors reference sam3/sam3/train/matcher.py:431 (BinaryHungarianMatcherV2,
the variant Sam3Image uses: focal class cost + L1 + GIoU with weights
2/5/2, alpha 0.25, gamma 2).

TPU-first: the cost matrix is built on device (batched, static shapes with
padded targets); the assignment itself is solved on host through
jax.pure_callback into scipy.linear_sum_assignment — the matrices are
(200, max_targets) and the reference also solves on CPU (scipy). Padded
target slots get +inf-ish cost so they are never chosen; returned
assignments are fixed-width (num_targets_max) index arrays with a validity
mask.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.masks import generalized_box_iou
from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy

BIG_COST = 1e6


def _lsa_host(cost):
    """cost: (B, Q, T) numpy -> (B, T) query index assigned to each target."""
    from scipy.optimize import linear_sum_assignment

    b, q, t = cost.shape
    out = np.zeros((b, t), np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        # rows: query indices, cols: target indices
        out[i][cols] = rows.astype(np.int32)
    return out


def hungarian_match(
    pred_logits,  # (B, Q, 1)
    pred_boxes,  # (B, Q, 4) cxcywh
    tgt_boxes,  # (B, T, 4) cxcywh (padded)
    tgt_valid,  # (B, T) bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """Returns (assigned_query (B, T) int32, tgt_valid)."""
    s = pred_logits[..., 0]
    prob = jax.nn.sigmoid(s)  # (B, Q)
    # reference matcher.py:590-596: log-sigmoid for numerical stability
    log_p = jax.nn.log_sigmoid(s)
    log_1mp = jax.nn.log_sigmoid(-s)
    c_class = (
        -alpha * (1 - prob) ** gamma * log_p
        + (1 - alpha) * prob**gamma * log_1mp
    )[:, :, None]  # (B, Q, 1) -> broadcast to T

    c_bbox = jnp.abs(pred_boxes[:, :, None] - tgt_boxes[:, None, :]).sum(-1)
    giou = jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    cost = cost_class * c_class + cost_bbox * c_bbox - cost_giou * giou
    cost = jnp.where(tgt_valid[:, None, :], cost, BIG_COST)
    cost = jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)

    b, q, t = cost.shape
    assigned = jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        cost,
        vmap_method="sequential",
    )
    return assigned, tgt_valid
