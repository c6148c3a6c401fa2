"""COCO-style detection mAP evaluator (no pycocotools).

Reimplements the COCOeval core the reference wraps (sam3/sam3/eval/
coco_eval.py:42): greedy score-ordered matching per IoU threshold
(0.5:0.95:0.05), 101-point interpolated AP, AP50/AP75, per-category then
mean. Supports bbox ('xywh') or segm (mask) IoU.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from efficientsam3_tpu.eval.coco_format import box_iou_np, mask_iou_np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0, 1, 101)


class CocoMAPEvaluator:
    """add_image(...) per (image, category); summarize() -> AP dict."""

    def __init__(self, iou_type: str = "bbox", max_dets: int = 100):
        assert iou_type in ("bbox", "segm")
        self.iou_type = iou_type
        self.max_dets = max_dets
        # per category: list of (scores, tp_flags (T, D)), plus gt counts
        self._dt = defaultdict(list)
        self._n_gt = defaultdict(int)

    def add_image(self, category_id, dt_scores, dt_geoms, gt_geoms, gt_iscrowd=None):
        """dt_geoms/gt_geoms: (N, 4) xywh boxes or (N, H, W) masks."""
        dt_scores = np.asarray(dt_scores, np.float64)
        order = np.argsort(-dt_scores)[: self.max_dets]
        dt_scores = dt_scores[order]
        n_dt, n_gt = len(dt_scores), len(gt_geoms)
        self._n_gt[category_id] += n_gt
        if n_dt == 0:
            return
        if n_gt == 0:
            tp = np.zeros((len(IOU_THRS), n_dt), bool)
            self._dt[category_id].append((dt_scores, tp))
            return
        dt_geoms = np.asarray(dt_geoms)[order]
        if self.iou_type == "bbox":
            iou = box_iou_np(np.asarray(dt_geoms, np.float64), np.asarray(gt_geoms, np.float64))
        else:
            iou = mask_iou_np(np.asarray(dt_geoms), np.asarray(gt_geoms))
        tp = np.zeros((len(IOU_THRS), n_dt), bool)
        for ti, thr in enumerate(IOU_THRS):
            taken = np.zeros(n_gt, bool)
            for di in range(n_dt):
                best, best_j = thr, -1
                for gj in range(n_gt):
                    if taken[gj]:
                        continue
                    if iou[di, gj] >= best:
                        best, best_j = iou[di, gj], gj
                if best_j >= 0:
                    taken[best_j] = True
                    tp[ti, di] = True
        self._dt[category_id].append((dt_scores, tp))

    @staticmethod
    def _ap(scores, tp, n_gt):
        """101-point interpolated AP per IoU threshold. tp: (T, D)."""
        if n_gt == 0:
            return np.full(len(IOU_THRS), np.nan)
        order = np.argsort(-scores)
        tp = tp[:, order]
        cum_tp = np.cumsum(tp, axis=1)
        cum_fp = np.cumsum(~tp, axis=1)
        rec = cum_tp / n_gt
        prec = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
        ap = np.zeros(len(IOU_THRS))
        for ti in range(len(IOU_THRS)):
            p = prec[ti]
            # monotone non-increasing envelope
            for i in range(len(p) - 1, 0, -1):
                p[i - 1] = max(p[i - 1], p[i])
            inds = np.searchsorted(rec[ti], RECALL_THRS, side="left")
            q = np.where(inds < len(p), p[np.minimum(inds, len(p) - 1)], 0.0)
            ap[ti] = q.mean()
        return ap

    def summarize(self) -> dict:
        aps = []
        for cat in set(list(self._dt) + list(self._n_gt)):
            entries = self._dt.get(cat, [])
            n_gt = self._n_gt.get(cat, 0)
            if n_gt == 0:
                continue
            if entries:
                scores = np.concatenate([s for s, _ in entries])
                tp = np.concatenate([t for _, t in entries], axis=1)
            else:
                scores = np.zeros(0)
                tp = np.zeros((len(IOU_THRS), 0), bool)
            aps.append(self._ap(scores, tp, n_gt))
        if not aps:
            return {"AP": float("nan"), "AP50": float("nan"), "AP75": float("nan")}
        aps = np.stack(aps)  # (C, T)
        mean = np.nanmean(aps, axis=0)
        return {
            "AP": float(mean.mean()),
            "AP50": float(mean[0]),
            "AP75": float(mean[5]),
        }
