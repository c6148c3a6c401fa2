"""Detection losses for SAM3 training (stage 3 / full-model finetune).

Mirrors the reference loss stack faithfully:
  - IABCEMdetr (loss_fns.py:267): soft-IoU-aware BCE with pos_weight on
    matched queries, prob^gamma-modulated BCE on negatives, presence focal
    loss, keep-masking for no-GT samples.
  - Boxes (loss_fns.py:518): L1 + GIoU on matched pairs, / num_boxes.
  - Masks (loss_fns.py:568): focal + dice, either full-resolution or
    PointRend-style sampled points (mask_sampling.py).
  - SemanticSegCriterion (loss_fns.py:1000), iou_loss (loss_fns.py:179).
  - Sam3LossWrapper (sam3_loss.py:37): deep supervision over every decoder
    layer's aux output, o2m (DAC) losses with BinaryOneToManyMatcher on the
    final layer (matcher.py:672) and the o2o Hungarian matcher on aux o2m
    outputs (use_o2m_matcher_on_o2m_aux=False, the stage-3 config), all
    weighted by o2m_weight.

Default weights follow the stage-3 mixed config
(configs/stage3/mixed/stage3_mixed_sacap_sa1b_tvm_mcs0_seg_img_fpn.yaml:64-99):
loss_ce 20, presence 20, bbox 5, giou 2, mask 200, dice 10, o2m_weight 2.

TPU-first: every loss is computed over fixed-width padded targets with
validity masks. The o2o Hungarian assignments for ALL decoder layers (and
aux-o2m layers) are solved in ONE host callback by folding the layer axis
into the batch. The one-to-many (DAC) matcher is pure JAX (quantile +
threshold), no callback. Normalization by the world-total number of boxes
(sam3_loss.py:65) becomes a psum when running under a mesh (pass
`num_boxes` already reduced).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy
from efficientsam3_tpu.ops.focal_loss import optax_bce, sigmoid_focal_loss
from efficientsam3_tpu.ops.interpolate import resize_bilinear
from efficientsam3_tpu.ops.masks import box_iou_xyxy, generalized_box_iou
from efficientsam3_tpu.train.matcher import hungarian_match


# ---------------------------------------------------------------------------
# box helpers (reference box_ops.py fast_diag_* semantics: no epsilon)
# ---------------------------------------------------------------------------


def diag_box_iou(a_xyxy, b_xyxy, eps: float = 1e-9):
    """Elementwise IoU of aligned boxes (box_ops.py:173 fast_diag_box_iou)."""
    lt = jnp.maximum(a_xyxy[..., :2], b_xyxy[..., :2])
    rb = jnp.minimum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    inter = jnp.clip(rb - lt, 0.0).prod(-1)
    area_a = jnp.clip(a_xyxy[..., 2:] - a_xyxy[..., :2], 0.0).prod(-1)
    area_b = jnp.clip(b_xyxy[..., 2:] - b_xyxy[..., :2], 0.0).prod(-1)
    return inter / jnp.maximum(area_a + area_b - inter, eps)


def diag_generalized_box_iou(a_xyxy, b_xyxy, eps: float = 1e-9):
    """Elementwise GIoU (box_ops.py:146 fast_diag_generalized_box_iou)."""
    iou = diag_box_iou(a_xyxy, b_xyxy, eps)
    lt = jnp.minimum(a_xyxy[..., :2], b_xyxy[..., :2])
    rb = jnp.maximum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    hull = jnp.clip(rb - lt, 0.0).prod(-1)
    area_a = jnp.clip(a_xyxy[..., 2:] - a_xyxy[..., :2], 0.0).prod(-1)
    area_b = jnp.clip(b_xyxy[..., 2:] - b_xyxy[..., :2], 0.0).prod(-1)
    inter = jnp.clip(
        jnp.minimum(a_xyxy[..., 2:], b_xyxy[..., 2:])
        - jnp.maximum(a_xyxy[..., :2], b_xyxy[..., :2]),
        0.0,
    ).prod(-1)
    union = area_a + area_b - inter
    return iou - (hull - union) / jnp.maximum(hull, eps)


def _gather_queries(per_query, assigned):
    """per_query (B, Q, ...) indexed by assigned (B, T) -> (B, T, ...)."""
    return jax.vmap(lambda p, i: p[i])(per_query, assigned)


# ---------------------------------------------------------------------------
# IABCEMdetr (classification + presence), reference loss_fns.py:267
# ---------------------------------------------------------------------------


def iabce_classification_loss(
    pred_logits,  # (B, Q, 1)
    pred_boxes,  # (B, Q, 4) cxcywh
    assigned,  # (B, T) query index per target (Hungarian)
    tgt_boxes,  # (B, T, 4) cxcywh
    tgt_valid,  # (B, T) bool
    *,
    pos_weight: float = 10.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    use_presence: bool = True,
    is_exhaustive=None,  # (B,) bool; None = all exhaustive (weak_loss off)
):
    """Soft-target BCE classification loss (IABCEMdetr.get_loss).

    Matched queries get a soft target t = prob^alpha * IoU^(1-alpha)
    (clamped to >= 0.01, detached) scaled by pos_weight; unmatched queries
    get hard-negative BCE modulated by prob^gamma. With use_presence the
    per-query loss is zeroed for samples with no visible GT (the presence
    token carries that supervision instead). Reduction: mean over (B, Q)
    [pad_n_queries=128 < Q=200 in the stage-3 config -> plain mean], or
    the weak-loss masked mean when is_exhaustive is provided.
    """
    s = pred_logits[..., 0]  # (B, Q)
    prob = jax.nn.sigmoid(s)
    b, q = s.shape

    matched_prob = _gather_queries(prob, assigned)  # (B, T)
    matched_boxes = _gather_queries(pred_boxes, assigned)  # (B, T, 4)
    iou = diag_box_iou(
        box_cxcywh_to_xyxy(matched_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    t_soft = jnp.clip(matched_prob**alpha * jnp.clip(iou, 0.0) ** (1 - alpha), 0.01)
    t_soft = jax.lax.stop_gradient(jnp.where(tgt_valid, t_soft, 0.0))
    ones = jnp.where(tgt_valid, 1.0, 0.0)

    # Hungarian assignments are unique per sample, so scatter-add == set.
    target_classes = jax.vmap(lambda z, i, v: z.at[i].add(v))(
        jnp.zeros((b, q)), assigned, ones
    )
    positive_targets = jax.vmap(lambda z, i, v: z.at[i].add(v))(
        jnp.zeros((b, q)), assigned, t_soft
    )

    loss = optax_bce(s, positive_targets) * target_classes * pos_weight
    loss = loss + optax_bce(s, target_classes) * (1.0 - target_classes) * prob**gamma

    if use_presence:
        # zero classification loss for samples without any visible GT
        visible = tgt_valid & (tgt_boxes[..., 2] > 0) & (tgt_boxes[..., 3] > 0)
        keep = visible.any(-1, keepdims=True).astype(loss.dtype)  # (B, 1)
        loss = loss * keep

    if is_exhaustive is not None:
        # weak loss: nullify negative supervision for non-exhaustive samples
        neg_mask = (~is_exhaustive)[:, None] & (target_classes < 0.5)
        loss_mask = ~neg_mask
        loss = loss * loss_mask.astype(loss.dtype)
        return loss.sum() / (loss_mask.sum() + 1e-6)
    return loss.mean()


def presence_focal_loss(presence_logits, keep, alpha: float = 0.5, gamma: float = 0.0):
    """Focal BCE on the presence token, normalized by batch size
    (loss_fns.py:418-436: sigmoid_focal_loss(..., num_boxes=bs))."""
    pl = presence_logits.reshape(keep.shape)
    loss = sigmoid_focal_loss(pl, keep.astype(pl.dtype), alpha, gamma)
    return loss.sum() / pl.shape[0]


# ---------------------------------------------------------------------------
# Boxes, reference loss_fns.py:518
# ---------------------------------------------------------------------------


def box_losses(pred_boxes, assigned, tgt_boxes, tgt_valid, num_boxes):
    """L1 + GIoU on matched pairs, summed / num_boxes."""
    matched = _gather_queries(pred_boxes, assigned)  # (B, T, 4)
    valid = tgt_valid.astype(pred_boxes.dtype)
    l1 = (jnp.abs(matched - tgt_boxes).sum(-1) * valid).sum()
    giou = diag_generalized_box_iou(
        box_cxcywh_to_xyxy(matched), box_cxcywh_to_xyxy(tgt_boxes)
    )
    giou_l = ((1.0 - giou) * valid).sum()
    return l1 / num_boxes, giou_l / num_boxes


# ---------------------------------------------------------------------------
# Masks (full + PointRend-sampled), reference loss_fns.py:568 + mask_sampling.py
# ---------------------------------------------------------------------------


def _point_sample(maps, coords):
    """Bilinear sample (N, H, W) maps at (N, P, 2) coords in [0,1]x[0,1]
    (mask_sampling.py:10 point_sample / F.grid_sample align_corners=False)."""
    from efficientsam3_tpu.ops.grid_sample import grid_sample

    grid = (coords * 2.0 - 1.0)[:, :, None, :]  # (N, P, 1, 2)
    out = grid_sample(maps[:, None], grid)  # (N, 1, P, 1)
    return out[:, 0, :, 0]


def sample_uncertain_points(
    rng, logits, num_points: int, oversample_ratio: float,
    importance_sample_ratio: float,
):
    """PointRend uncertainty sampling (mask_sampling.py:38): oversample
    uniformly, keep the most-uncertain (|logit| smallest) fraction, fill the
    rest with fresh uniform points. logits: (N, h, w) -> (N, P, 2)."""
    n = logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (n, num_sampled, 2))
    point_logits = _point_sample(logits, coords)
    unc = -jnp.abs(point_logits)  # (N, S)
    _, idx = jax.lax.top_k(unc, num_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if num_random > 0:
        picked = jnp.concatenate(
            [picked, jax.random.uniform(r2, (n, num_random, 2))], axis=1
        )
    return picked


def mask_focal_dice_loss(
    pred_masks,  # (B, T, h, w) matched mask logits
    tgt_masks,  # (B, T, H, W) float {0,1}
    valid,  # (B, T)
    num_boxes,
    *,
    alpha: float = 0.25,
    gamma: float = 2.0,
    num_sample_points: Optional[int] = None,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    rng: Optional[jax.Array] = None,
):
    """Focal + dice on matched masks. Full path upsamples predictions to the
    target resolution (loss_fns.py:640-668); sampled path evaluates
    num_sample_points PointRend points per mask (loss_fns.py:580-616)."""
    b, t = valid.shape
    v = valid.astype(jnp.float32)
    if num_sample_points is not None:
        assert rng is not None, "sampled mask loss needs an rng"
        flat_pred = pred_masks.reshape(b * t, *pred_masks.shape[-2:])
        flat_tgt = tgt_masks.reshape(b * t, *tgt_masks.shape[-2:])
        coords = sample_uncertain_points(
            rng, jax.lax.stop_gradient(flat_pred), num_sample_points,
            oversample_ratio, importance_sample_ratio,
        )
        p = _point_sample(flat_pred, coords)  # (N, P)
        tg = jax.lax.stop_gradient(_point_sample(flat_tgt, coords))
    else:
        hw = tgt_masks.shape[-2:]
        up = resize_bilinear(
            pred_masks.reshape(b * t, 1, *pred_masks.shape[-2:]), hw
        )[:, 0]
        p = up.reshape(b * t, hw[0] * hw[1])
        tg = tgt_masks.reshape(b * t, hw[0] * hw[1])

    vf = v.reshape(b * t)
    focal = sigmoid_focal_loss(p, tg, alpha, gamma).mean(-1) * vf
    loss_mask = focal.sum() / num_boxes

    ps = jax.nn.sigmoid(p)
    num = 2.0 * (ps * tg).sum(-1)
    den = ps.sum(-1) + tg.sum(-1)
    dice = (1.0 - (num + 1.0) / (den + 1.0)) * vf
    loss_dice = dice.sum() / num_boxes
    return loss_mask, loss_dice


def iou_loss(pred_masks, tgt_masks, pred_ious, num_boxes, use_l1_loss=False):
    """MSE (or L1) between predicted IoUs and actual thresholded-mask IoUs
    (loss_fns.py:179). pred/tgt: (N, M, H, W) logits/binary; pred_ious (N, M)."""
    pm = (pred_masks.reshape(*pred_masks.shape[:2], -1) > 0)
    gm = (tgt_masks.reshape(*tgt_masks.shape[:2], -1) > 0)
    inter = (pm & gm).sum(-1).astype(jnp.float32)
    union = (pm | gm).sum(-1).astype(jnp.float32)
    actual = inter / jnp.clip(union, 1.0)
    err = jnp.abs(pred_ious - actual) if use_l1_loss else (pred_ious - actual) ** 2
    return err.sum() / num_boxes


def semantic_seg_loss(
    semantic_logits,  # (B, 1, h, w) or (B, h, w)
    tgt_masks,  # (B, T, H, W) instance masks
    tgt_valid,  # (B, T)
    *,
    presence_logit=None,
    focal: bool = False,
    focal_alpha: float = 0.6,
    focal_gamma: float = 1.6,
    presence_head: bool = False,
):
    """SemanticSegCriterion (loss_fns.py:1000): BCE/focal + dice between the
    semantic-seg head output and the union of instance masks, downsampled to
    the prediction size."""
    if semantic_logits.ndim == 4:
        semantic_logits = semantic_logits[:, 0]
    b, h, w = semantic_logits.shape
    tgt = resize_bilinear(tgt_masks.astype(jnp.float32), (h, w))
    tgt = tgt * tgt_valid[:, :, None, None]
    sem_t = (tgt > 0.5).any(axis=1).astype(jnp.float32)  # union -> (B, h, w)

    if focal:
        per = sigmoid_focal_loss(
            semantic_logits.reshape(b, -1), sem_t.reshape(b, -1),
            focal_alpha, focal_gamma,
        ).mean(-1)
    else:
        per = optax_bce(semantic_logits.reshape(b, -1), sem_t.reshape(b, -1)).mean(-1)

    ps = jax.nn.sigmoid(semantic_logits).reshape(b, -1)
    tf = sem_t.reshape(b, -1)
    dice = 1.0 - (2.0 * (ps * tf).sum(-1) + 1.0) / (ps.sum(-1) + tf.sum(-1) + 1.0)

    out = {}
    if presence_head:
        assert presence_logit is not None
        p_tgt = tf.any(-1)
        out["loss_semantic_presence"] = optax_bce(
            presence_logit.reshape(b), p_tgt.astype(jnp.float32)
        ).mean()
        nb = p_tgt.sum() + 1e-6
        per = per * p_tgt
        dice = dice * p_tgt
        out["loss_semantic_seg"] = per.sum() / nb
        out["loss_semantic_dice"] = dice.sum() / nb
    else:
        out["loss_semantic_seg"] = per.mean()
        out["loss_semantic_dice"] = dice.sum() / b
    return out


def det2trk_assoc_loss(
    assoc_logits,  # (B, Q_det, Q_trk + 2) [.., new_object, false_positive]
    matched_object_ids,  # (B, Q_det + Q_trk) int, -1 = unmatched
    num_boxes,
    *,
    pred_logits=None,  # (B, Q_det, 1), needed for use_fp_loss
    is_exhaustive=None,  # (B,) bool
    use_fp_loss: bool = False,
    fp_loss_on_exhaustive_only: bool = True,
    treat_fp_as_new_obj: bool = False,
):
    """Detection->tracking association loss (loss_fns.py:1153 Det2TrkAssoc).

    Labels per detection query: the tracking-query index sharing its GT
    object id; Q_trk ("new object") when matched to GT but no track;
    Q_trk+1 ("false positive") for confident unmatched detections (opt);
    -1 (ignored) otherwise. Softmax CE, masked to frames with >=1 valid
    track, summed / (B * num_boxes). Fixed shapes throughout.
    """
    b, q_det, q_tot = assoc_logits.shape
    q_trk = q_tot - 2
    ids_det = matched_object_ids[:, :q_det]
    ids_trk = matched_object_ids[:, q_det:]
    det_m = ids_det >= 0
    trk_m = ids_trk >= 0

    same = (
        det_m[:, :, None]
        & trk_m[:, None, :]
        & (ids_det[:, :, None] == ids_trk[:, None, :])
    )  # (B, Q_det, Q_trk)
    has_same = same.any(-1)
    trk_label = jnp.argmax(same, axis=-1)
    labels = jnp.where(has_same, trk_label, -1)
    labels = jnp.where(det_m & ~has_same, q_trk, labels)
    if use_fp_loss:
        assert pred_logits is not None
        fp = ~det_m & (pred_logits[..., 0] > 0)
        if treat_fp_as_new_obj:
            fp_label = q_trk
        else:
            # exhaustive filtering only applies on the dedicated FP label
            # branch (loss_fns.py:1206-1212)
            if fp_loss_on_exhaustive_only and is_exhaustive is not None:
                fp = fp & is_exhaustive[:, None]
            fp_label = q_trk + 1
        labels = jnp.where(fp, fp_label, labels)

    logp = jax.nn.log_softmax(assoc_logits, axis=-1)
    safe = jnp.clip(labels, 0)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    mask = (labels >= 0).astype(ce.dtype)
    frame_has_trk = trk_m.any(-1, keepdims=True).astype(ce.dtype)
    loss = (ce * mask * frame_has_trk).sum() / (b * num_boxes)
    return loss


# ---------------------------------------------------------------------------
# One-to-many (DAC) matcher, reference matcher.py:672 BinaryOneToManyMatcher
# ---------------------------------------------------------------------------


def one_to_many_match(
    pred_logits,  # (B, Q, 1)
    pred_boxes,  # (B, Q, 4) cxcywh
    tgt_boxes,  # (B, T, 4) cxcywh
    tgt_valid,  # (B, T)
    *,
    alpha: float = 0.3,
    threshold: float = 0.4,
    topk: int = 4,
):
    """Greedy one-to-many assignment: quality C = alpha*prob + (1-alpha)*IoU;
    a (query, target) pair matches iff C beats the per-target top-k quantile
    AND the threshold. Pure JAX (no Hungarian). Returns (match (B,Q,T) bool,
    C, iou)."""
    q = pred_logits.shape[1]
    prob = jax.nn.sigmoid(pred_logits[..., 0])  # (B, Q)
    iou = jax.vmap(box_iou_xyxy)(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )  # (B, Q, T)
    c = alpha * prob[:, :, None] + (1.0 - alpha) * iou
    quant = jnp.quantile(c, 1.0 - topk / q, axis=1, keepdims=True)
    match = (c > quant) & (c > threshold) & tgt_valid[:, None, :]
    return match, c, iou


def o2m_classification_loss(
    pred_logits, match, iou, tgt_valid,
    *,
    pos_weight: float = 10.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    use_presence: bool = True,
):
    """IABCEMdetr on one-to-many matches. A query matched to several targets
    takes the soft target of its LAST matched target (reference scatter
    overwrite order, loss_fns.py:360-370)."""
    s = pred_logits[..., 0]
    prob = jax.nn.sigmoid(s)
    t = match.shape[-1]
    target_classes = match.any(-1).astype(s.dtype)  # (B, Q)
    last_idx = t - 1 - jnp.argmax(match[..., ::-1], axis=-1)  # (B, Q)
    iou_sel = jnp.take_along_axis(iou, last_idx[..., None], axis=-1)[..., 0]
    t_soft = jnp.clip(prob**alpha * jnp.clip(iou_sel, 0.0) ** (1 - alpha), 0.01)
    t_soft = jax.lax.stop_gradient(t_soft * target_classes)

    loss = optax_bce(s, t_soft) * target_classes * pos_weight
    loss = loss + optax_bce(s, target_classes) * (1.0 - target_classes) * prob**gamma
    if use_presence:
        keep = tgt_valid.any(-1, keepdims=True).astype(loss.dtype)
        loss = loss * keep
    return loss.mean()


def o2m_box_losses(pred_boxes, match, tgt_boxes, num_boxes):
    """L1 + GIoU summed over every matched (query, target) pair."""
    l1 = jnp.abs(pred_boxes[:, :, None] - tgt_boxes[:, None, :]).sum(-1)
    giou = jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    m = match.astype(pred_boxes.dtype)
    return (l1 * m).sum() / num_boxes, ((1.0 - giou) * m).sum() / num_boxes


def o2m_mask_loss(
    pred_masks,  # (B, Q, h, w)
    match,  # (B, Q, T)
    c,  # (B, Q, T) match quality (for static top-k pair selection)
    tgt_masks,  # (B, T, H, W)
    num_boxes,
    *,
    k: int = 6,
    alpha: float = 0.25,
    gamma: float = 2.0,
    num_sample_points: Optional[int] = None,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    rng: Optional[jax.Array] = None,
):
    """Masks loss over o2m pairs with static shapes: per target, take the
    top-k candidate queries by quality and mask by the actual match bit.
    The one-to-many matcher keeps at most ceil(topk)+1 queries per target
    (quantile cut), so k=topk+2 loses nothing."""
    b, q, t = match.shape
    scores = jnp.where(match, c, -jnp.inf)  # (B, Q, T)
    top_c, top_q = jax.lax.top_k(scores.transpose(0, 2, 1), k)  # (B, T, K)
    sel_valid = jnp.isfinite(top_c)  # (B, T, K)
    sel_masks = jax.vmap(lambda m, i: m[i])(
        pred_masks, top_q.reshape(b, t * k)
    ).reshape(b, t, k, *pred_masks.shape[-2:])
    tgt = jnp.broadcast_to(
        tgt_masks[:, :, None], (b, t, k, *tgt_masks.shape[-2:])
    )
    return mask_focal_dice_loss(
        sel_masks.reshape(b, t * k, *sel_masks.shape[-2:]),
        tgt.reshape(b, t * k, *tgt.shape[-2:]),
        sel_valid.reshape(b, t * k),
        num_boxes,
        alpha=alpha,
        gamma=gamma,
        num_sample_points=num_sample_points,
        oversample_ratio=oversample_ratio,
        importance_sample_ratio=importance_sample_ratio,
        rng=rng,
    )


# ---------------------------------------------------------------------------
# Sam3LossWrapper equivalent: deep supervision + o2m over all decoder layers
# ---------------------------------------------------------------------------

DEFAULT_WEIGHTS = {
    # stage-3 mixed config weights (stage3_mixed_sacap_sa1b_tvm_mcs0_seg_img_fpn.yaml)
    "loss_ce": 20.0,
    "presence_loss": 20.0,
    "loss_bbox": 5.0,
    "loss_giou": 2.0,
    "loss_mask": 200.0,
    "loss_dice": 10.0,
    "loss_semantic_seg": 0.0,
    "loss_semantic_dice": 0.0,
}


def sam3_detection_loss(
    outputs,
    targets,
    weights: Optional[dict] = None,
    *,
    o2m_weight: float = 2.0,
    pos_weight: float = 10.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    o2m_alpha: float = 0.3,
    o2m_threshold: float = 0.4,
    o2m_topk: int = 4,
    num_boxes=None,
    num_sample_points: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    mask_aux: bool = False,
):
    """Full Sam3 detection loss with deep supervision.

    outputs: dict from Sam3ImageModel.ground (train=True):
      pred_logits/pred_boxes/pred_masks (final o2o), presence_logit_dec,
      aux {pred_logits (A,B,2Q,1), pred_boxes, presence_logits},
      pred_logits_o2m/pred_boxes_o2m/pred_masks_o2m (final o2m).
    targets: dict with 'boxes' (B, T, 4) cxcywh, 'valid' (B, T) bool,
      optional 'masks' (B, T, H, W), 'mask_valid' (B, T),
      'is_exhaustive' (B,) bool.

    Returns (total, parts) where parts carries reference-style keys
    (loss_ce, loss_bbox, ..., with _aux_{i} / _o2m suffixes).
    """
    w = dict(DEFAULT_WEIGHTS, **(weights or {}))
    tgt_boxes = targets["boxes"]
    tgt_valid = targets["valid"]
    is_exh = targets.get("is_exhaustive")
    if num_boxes is None:
        num_boxes = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)

    nq = outputs["pred_logits"].shape[1]

    # ---- assemble per-layer output stacks: [aux..., final] ----
    o2o_layers = [(outputs["pred_logits"], outputs["pred_boxes"])]
    o2m_aux_layers = []
    if "aux" in outputs and outputs["aux"] is not None:
        aux_l = outputs["aux"]["pred_logits"]  # (A, B, 2Q or Q, 1)
        aux_b = outputs["aux"]["pred_boxes"]
        a = aux_l.shape[0]
        for i in range(a):
            o2o_layers.insert(i, (aux_l[i][:, :nq], aux_b[i][:, :nq]))
            if aux_l.shape[2] > nq:
                o2m_aux_layers.append((aux_l[i][:, nq:], aux_b[i][:, nq:]))

    # ---- ONE Hungarian callback for every o2o layer + every aux-o2m layer
    # (use_o2m_matcher_on_o2m_aux=False -> aux o2m uses the o2o matcher) ----
    all_pairs = o2o_layers + o2m_aux_layers
    # matching is non-differentiable (host scipy through pure_callback):
    # stop_gradient keeps the callback out of the JVP path entirely
    stacked_logits = jax.lax.stop_gradient(
        jnp.stack([p[0] for p in all_pairs])
    )  # (S, B, Q, 1)
    stacked_boxes = jax.lax.stop_gradient(jnp.stack([p[1] for p in all_pairs]))
    s, b = stacked_logits.shape[:2]
    assigned_all, _ = hungarian_match(
        stacked_logits.reshape(s * b, nq, 1),
        stacked_boxes.reshape(s * b, nq, 4),
        jnp.tile(tgt_boxes, (s, 1, 1)),
        jnp.tile(tgt_valid, (s, 1)),
    )
    assigned_all = jax.lax.stop_gradient(assigned_all).reshape(s, b, -1)

    n_layers = len(o2o_layers)
    parts = {}
    total = 0.0

    def add(key, value, weight_key):
        parts[key] = value
        return w.get(weight_key, 0.0) * value

    visible = tgt_valid & (tgt_boxes[..., 2] > 0) & (tgt_boxes[..., 3] > 0)
    keep = visible.any(-1).astype(jnp.float32)

    # presence logits per layer: final + aux
    presence_final = outputs.get("presence_logit_dec")
    presence_aux = None
    if "aux" in outputs and outputs["aux"] is not None:
        presence_aux = outputs["aux"].get("presence_logits")

    for i, (logits, boxes) in enumerate(o2o_layers):
        is_final = i == n_layers - 1
        suffix = "" if is_final else f"_aux_{i}"
        assigned = assigned_all[i]
        ce = iabce_classification_loss(
            logits, boxes, assigned, tgt_boxes, tgt_valid,
            pos_weight=pos_weight, alpha=alpha, gamma=gamma,
            use_presence=True, is_exhaustive=is_exh,
        )
        total += add(f"loss_ce{suffix}", ce, "loss_ce")
        lb, lg = box_losses(boxes, assigned, tgt_boxes, tgt_valid, num_boxes)
        total += add(f"loss_bbox{suffix}", lb, "loss_bbox")
        total += add(f"loss_giou{suffix}", lg, "loss_giou")

        pres = presence_final if is_final else (
            presence_aux[i] if presence_aux is not None else None
        )
        if pres is not None:
            pl = presence_focal_loss(pres, keep)
            total += add(f"presence_loss{suffix}", pl, "presence_loss")

        do_mask = (is_final or mask_aux) and "pred_masks" in outputs
        if do_mask and is_final and "masks" in targets and targets["masks"] is not None:
            matched = _gather_queries(outputs["pred_masks"], assigned)
            mvalid = tgt_valid & targets.get("mask_valid", tgt_valid)
            lm, ld = mask_focal_dice_loss(
                matched, targets["masks"].astype(jnp.float32), mvalid, num_boxes,
                alpha=alpha, gamma=gamma,
                num_sample_points=num_sample_points,
                rng=None if rng is None else jax.random.fold_in(rng, i),
            )
            total += add(f"loss_mask{suffix}", lm, "loss_mask")
            total += add(f"loss_dice{suffix}", ld, "loss_dice")

    # ---- o2m (DAC) losses ----
    if "pred_logits_o2m" in outputs:
        match, c, iou = one_to_many_match(
            jax.lax.stop_gradient(outputs["pred_logits_o2m"]),
            jax.lax.stop_gradient(outputs["pred_boxes_o2m"]),
            tgt_boxes, tgt_valid,
            alpha=o2m_alpha, threshold=o2m_threshold, topk=o2m_topk,
        )
        ce = o2m_classification_loss(
            outputs["pred_logits_o2m"], match, iou, tgt_valid,
            pos_weight=pos_weight, alpha=alpha, gamma=gamma,
        )
        total += o2m_weight * add("loss_ce_o2m", ce, "loss_ce")
        lb, lg = o2m_box_losses(
            outputs["pred_boxes_o2m"], match, tgt_boxes, num_boxes
        )
        total += o2m_weight * add("loss_bbox_o2m", lb, "loss_bbox")
        total += o2m_weight * add("loss_giou_o2m", lg, "loss_giou")
        if (
            "pred_masks_o2m" in outputs
            and "masks" in targets
            and targets["masks"] is not None
        ):
            mvalid = tgt_valid & targets.get("mask_valid", tgt_valid)
            lm, ld = o2m_mask_loss(
                outputs["pred_masks_o2m"], match & mvalid[:, None, :], c,
                targets["masks"].astype(jnp.float32), num_boxes,
                k=o2m_topk + 2, alpha=alpha, gamma=gamma,
                num_sample_points=num_sample_points,
                rng=None if rng is None else jax.random.fold_in(rng, 999),
            )
            total += o2m_weight * add("loss_mask_o2m", lm, "loss_mask")
            total += o2m_weight * add("loss_dice_o2m", ld, "loss_dice")

    # ---- aux o2m with the o2o Hungarian matcher ----
    for j, (logits, boxes) in enumerate(o2m_aux_layers):
        assigned = assigned_all[n_layers + j]
        suffix = f"_aux_{j}_o2m"
        ce = iabce_classification_loss(
            logits, boxes, assigned, tgt_boxes, tgt_valid,
            pos_weight=pos_weight, alpha=alpha, gamma=gamma,
            use_presence=True, is_exhaustive=is_exh,
        )
        total += o2m_weight * add(f"loss_ce{suffix}", ce, "loss_ce")
        lb, lg = box_losses(boxes, assigned, tgt_boxes, tgt_valid, num_boxes)
        total += o2m_weight * add(f"loss_bbox{suffix}", lb, "loss_bbox")
        total += o2m_weight * add(f"loss_giou{suffix}", lg, "loss_giou")

    # ---- semantic segmentation criterion (optional) ----
    if (
        outputs.get("semantic_seg") is not None
        and "masks" in targets
        and targets["masks"] is not None
        and (w.get("loss_semantic_seg", 0.0) or w.get("loss_semantic_dice", 0.0))
    ):
        sem = semantic_seg_loss(
            outputs["semantic_seg"], targets["masks"].astype(jnp.float32),
            tgt_valid,
        )
        for k_, v_ in sem.items():
            total += add(k_, v_, k_)

    return total, parts
