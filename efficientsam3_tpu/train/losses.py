"""Detection losses for SAM3 training (stage 3 / full-model finetune).

Mirrors the reference loss stack (sam3/sam3/train/loss/loss_fns.py:
IABCEMdetr :267 focal classification with presence, Boxes :518 L1+GIoU,
Masks :568 BCE+dice, sam3_loss.py:37 Sam3LossWrapper weighting), using
Hungarian assignments from train/matcher.py.

TPU-first: every loss is computed over fixed-width padded targets with
validity masks; normalization by the world-total number of boxes
(sam3_loss.py:65) becomes a psum when running under a mesh (the caller
passes `num_boxes` already reduced).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy
from efficientsam3_tpu.ops.focal_loss import dice_loss, optax_bce, sigmoid_focal_loss
from efficientsam3_tpu.ops.masks import generalized_box_iou
from efficientsam3_tpu.train.matcher import hungarian_match


def classification_focal_loss(
    pred_logits,  # (B, Q, 1)
    assigned,  # (B, T) query index per target
    tgt_valid,  # (B, T)
    num_boxes,  # scalar normalizer
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """Binary focal loss: matched queries are positives (loss_fns.py:267)."""
    b, q, _ = pred_logits.shape
    pos = jnp.zeros((b, q), pred_logits.dtype)
    ones = jnp.where(tgt_valid, 1.0, 0.0)
    pos = jax.vmap(lambda p, idx, v: p.at[idx].max(v))(pos, assigned, ones)
    loss = sigmoid_focal_loss(pred_logits[..., 0], pos, alpha, gamma)
    return loss.sum() / jnp.maximum(num_boxes, 1.0)


def box_losses(pred_boxes, assigned, tgt_boxes, tgt_valid, num_boxes):
    """L1 + GIoU on matched pairs (loss_fns.py:518)."""
    matched = jax.vmap(lambda p, idx: p[idx])(pred_boxes, assigned)  # (B, T, 4)
    valid = tgt_valid.astype(pred_boxes.dtype)
    l1 = jnp.abs(matched - tgt_boxes).sum(-1) * valid
    giou_mat = jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(matched), box_cxcywh_to_xyxy(tgt_boxes)
    )
    diag = jnp.diagonal(giou_mat, axis1=1, axis2=2)
    giou = (1.0 - diag) * valid
    denom = jnp.maximum(num_boxes, 1.0)
    return l1.sum() / denom, giou.sum() / denom


def mask_losses(pred_masks, assigned, tgt_masks, tgt_valid, num_boxes):
    """BCE + dice on matched masks (loss_fns.py:568; full-mask variant of
    the reference's point-sampled formulation)."""
    matched = jax.vmap(lambda p, idx: p[idx])(pred_masks, assigned)  # (B,T,h,w)
    h, w = matched.shape[-2:]
    if tgt_masks.shape[-2:] != (h, w):
        from efficientsam3_tpu.ops.interpolate import resize_bilinear

        tgt_masks = (resize_bilinear(tgt_masks, (h, w)) > 0.5).astype(jnp.float32)
    valid = tgt_valid.astype(jnp.float32)
    bce = optax_bce(matched, tgt_masks).mean(axis=(-2, -1)) * valid
    dl = dice_loss(
        matched.reshape(-1, h, w), tgt_masks.reshape(-1, h, w)
    ).reshape(valid.shape) * valid
    denom = jnp.maximum(num_boxes, 1.0)
    return bce.sum() / denom, dl.sum() / denom


def presence_loss(presence_logits, has_target):
    """BCE on the presence token (the image contains >=1 instance of the
    prompted concept)."""
    return optax_bce(presence_logits, has_target.astype(jnp.float32)).mean()


DEFAULT_WEIGHTS = {
    # sam3 loss weighting (train/loss/sam3_loss.py defaults)
    "class": 2.0,
    "bbox": 5.0,
    "giou": 2.0,
    "mask": 5.0,
    "dice": 5.0,
    "presence": 1.0,
}


def sam3_detection_loss(outputs, targets, weights: Optional[dict] = None):
    """Full detection loss for one find-stage.

    outputs: dict from Sam3ImageModel.ground (train=True)
    targets: dict with 'boxes' (B, T, 4) cxcywh, 'valid' (B, T) bool,
             'masks' optional (B, T, H, W) float/bool.
    """
    w = dict(DEFAULT_WEIGHTS, **(weights or {}))
    tgt_boxes = targets["boxes"]
    tgt_valid = targets["valid"]
    num_boxes = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)

    # Matching is non-differentiable (host scipy via pure_callback): keep it
    # out of the JVP path entirely.
    assigned, _ = hungarian_match(
        jax.lax.stop_gradient(outputs["pred_logits"]),
        jax.lax.stop_gradient(outputs["pred_boxes"]),
        tgt_boxes,
        tgt_valid,
    )
    assigned = jax.lax.stop_gradient(assigned)

    losses = {}
    losses["class"] = classification_focal_loss(
        outputs["pred_logits"], assigned, tgt_valid, num_boxes
    )
    losses["bbox"], losses["giou"] = box_losses(
        outputs["pred_boxes"], assigned, tgt_boxes, tgt_valid, num_boxes
    )
    if "masks" in targets and "pred_masks" in outputs:
        losses["mask"], losses["dice"] = mask_losses(
            outputs["pred_masks"], assigned, targets["masks"], tgt_valid, num_boxes
        )
    if outputs.get("presence_logit_dec") is not None:
        has_tgt = tgt_valid.any(axis=-1)
        losses["presence"] = presence_loss(outputs["presence_logit_dec"], has_tgt)

    total = sum(w[k] * v for k, v in losses.items())
    return total, losses
