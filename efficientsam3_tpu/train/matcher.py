"""Hungarian matching for DETR-style training.

Mirrors reference sam3/sam3/train/matcher.py:431 (BinaryHungarianMatcherV2,
the variant Sam3Image uses: focal class cost + L1 + GIoU with weights
2/5/2, alpha 0.25, gamma 2).

TPU-first: the cost matrix is built on device (batched, static shapes with
padded targets) and the assignment is ALSO solved on device by the exact
shortest-augmenting-path Hungarian in ops/hungarian.py — the reference
(and a previous revision here) round-trips to scipy on the host every
step, which stalls the training pipeline and is impossible on PJRT
backends without host-callback support. Padded target slots get
+inf-ish cost so they are never preferred; returned assignments are
fixed-width (num_targets_max) index arrays with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.hungarian import solve_assignment_batched
from efficientsam3_tpu.ops.masks import generalized_box_iou
from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy

BIG_COST = 1e6


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

    # rows = targets, columns = queries (T <= Q): each target gets a
    # distinct query, minimizing total cost — same optimum as scipy
    assigned = solve_assignment_batched(jnp.swapaxes(cost, 1, 2))
    return assigned, tgt_valid
