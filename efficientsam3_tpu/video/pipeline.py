"""Video promptable concept segmentation: per-frame detect + track.

Mirrors the reference SPMD orchestration (sam3/sam3/model/sam3_video_base.py
:151 _det_track_one_frame, 5 steps) as a host-driven loop over jitted device
programs:

  1. detection on the current frame (Sam3ImageModel.ground + mask NMS),
  2. tracker propagation for all object slots (one batched program),
  3. association planning on host: Hungarian matching on the mask-IoU
     matrix between detections and tracked masks (reference
     perflib/associate_det_trk.py:11), hotstart counting, keep-alive and
     occlusion suppression (sam3_video_base.py:1311/:819),
  4. execution: new objects claim free slots, their memory is encoded,
  5. outputs assembled on host.

TPU-first: the device work is two fixed-shape programs per frame
(detector grounding; tracker step over padded object slots) — the
reference's NCCL all_gathers between GPUs become either a single-chip
batched program or shard_map over an 'objects' mesh axis (parallel/),
and the rank-0 Gloo plan broadcast becomes plain host code (JAX SPMD
runs one host program anyway; see SURVEY §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class VideoPCSConfig:
    """Detection/tracking heuristics (reference sam3_video_base.py:36-133)."""

    det_score_thresh: float = 0.5
    nms_iou_thresh: float = 0.7
    assoc_iou_thresh: float = 0.5  # det <-> track association
    new_det_thresh: float = 0.6  # score needed to spawn a new masklet
    hotstart_delay: int = 15  # frames before a masklet is confirmed
    hotstart_min_hits: int = 3  # detections required within the delay
    keep_alive_frames: int = 30  # unmatched masklet survival
    obj_slots: int = 8
    max_dets: int = 20
    # occlusion suppression (sam3_video_base.py:819): hide masklets whose
    # tracker object score stays below this for `occlusion_patience` frames
    occlusion_score_thresh: float = 0.0
    occlusion_patience: int = 3
    # reconditioning (sam3_video_base.py:453): when a confirmed masklet
    # matches a high-confidence detection, re-anchor its memory on the
    # detection mask as a new conditioning frame
    recondition_score_thresh: float = 0.8
    recondition_every: int = 10


@dataclasses.dataclass
class Masklet:
    obj_id: int
    slot: int
    start_frame: int
    hits: int = 1
    last_matched: int = 0
    confirmed: bool = False
    low_score_streak: int = 0
    occluded: bool = False
    last_recondition: int = -(10**9)


class VideoPCSPredictor:
    """Single-host video PCS: text-prompted detection + streaming tracking."""

    def __init__(self, detector, tracker_predictor, cfg: Optional[VideoPCSConfig] = None):
        """detector: callable(frame (1,H,W,3), text_state) ->
            {'masks' (D, H, W) bool, 'scores' (D,), 'boxes' (D, 4)} after
            thresholding+NMS (host-filtered).
        tracker_predictor: video.predictor.TrackerPredictor.
        """
        self.detector = detector
        self.tracker = tracker_predictor
        self.cfg = cfg or VideoPCSConfig()
        self._next_obj_id = 0

    # -- association (reference perflib/associate_det_trk.py:11) ----------
    @staticmethod
    def associate_det_trk(det_masks, trk_masks, iou_thresh):
        """Hungarian matching on mask IoU. Returns list of (det_i, trk_j)."""
        from scipy.optimize import linear_sum_assignment

        from efficientsam3_tpu.ops.masks import mask_iou

        if det_masks.shape[0] == 0 or trk_masks.shape[0] == 0:
            return [], np.zeros((det_masks.shape[0], trk_masks.shape[0]))
        iou = np.asarray(mask_iou(jnp.asarray(det_masks), jnp.asarray(trk_masks)))
        rows, cols = linear_sum_assignment(-iou)
        pairs = [(i, j) for i, j in zip(rows, cols) if iou[i, j] >= iou_thresh]
        return pairs, iou

    def run_video(self, frames, text_state, start_frame: int = 0):
        """Generator over frames: yields dict(frame_idx, obj_ids, masks,
        scores). frames: (T, H, W, 3)."""
        cfg = self.cfg
        state = self.tracker.init_state(frames)
        masklets: dict[int, Masklet] = {}

        for t in range(start_frame, len(frames)):
            det = self.detector(frames[t], text_state)
            det_masks = det["masks"][: cfg.max_dets]
            det_scores = det["scores"][: cfg.max_dets]

            # 2. propagate existing masklets
            trk_masks = np.zeros((0, *det_masks.shape[1:]), bool)
            active = [m for m in masklets.values()]
            if active and state["cond_frames"]:
                out = self.tracker._run_track_frame(state, t)
                state["non_cond_frames"][t] = out
                n_obj = len(state["obj_ids"])
                low = out["low_res_masks"][:n_obj, 0]  # (n, 288, 288)
                from efficientsam3_tpu.ops.interpolate import resize_bilinear

                trk_masks = (
                    np.asarray(
                        resize_bilinear(
                            jnp.asarray(low)[:, None], det_masks.shape[1:]
                        )
                    )[:, 0]
                    > 0
                )

            # 3. planning: associate detections with tracked masks
            pairs, _ = self.associate_det_trk(
                det_masks, trk_masks, cfg.assoc_iou_thresh
            )
            matched_dets = {i for i, _ in pairs}
            matched_trks = {j for _, j in pairs}

            frame_out = state["non_cond_frames"].get(t)
            trk_to_det = {j: i for i, j in pairs}
            for m in active:
                slot = state["obj_ids"].index(m.obj_id)
                if slot in matched_trks:
                    m.hits += 1
                    m.last_matched = t
                if not m.confirmed and m.hits >= cfg.hotstart_min_hits:
                    m.confirmed = True
                # occlusion suppression: low object score for several frames
                if frame_out is not None:
                    score = float(frame_out["object_score_logits"][slot, 0])
                    if score < cfg.occlusion_score_thresh:
                        m.low_score_streak += 1
                    else:
                        m.low_score_streak = 0
                    m.occluded = m.low_score_streak >= cfg.occlusion_patience
                # reconditioning: re-anchor memory on a confident matched det
                if (
                    m.confirmed
                    and slot in trk_to_det
                    and t - m.last_recondition >= cfg.recondition_every
                    and det_scores[trk_to_det[slot]] >= cfg.recondition_score_thresh
                ):
                    self.tracker.add_new_mask(
                        state, t, m.obj_id, det_masks[trk_to_det[slot]]
                    )
                    m.last_recondition = t
                if t - m.last_matched > cfg.keep_alive_frames:
                    self.tracker.remove_object(state, m.obj_id)
                    del masklets[m.obj_id]

            # 4. execution: spawn new masklets from unmatched detections
            for i in range(det_masks.shape[0]):
                if i in matched_dets or det_scores[i] < cfg.new_det_thresh:
                    continue
                if len(state["obj_ids"]) >= cfg.obj_slots:
                    break
                obj_id = self._next_obj_id
                self._next_obj_id += 1
                self.tracker.add_new_mask_like(state, t, obj_id, det_masks[i])
                masklets[obj_id] = Masklet(obj_id, len(state["obj_ids"]) - 1, t)

            # 5. outputs (confirmed masklets only, after hotstart delay)
            out_ids, out_masks = [], []
            for m in masklets.values():
                if m.occluded:
                    continue
                if not m.confirmed and t - m.start_frame < cfg.hotstart_delay:
                    continue
                slot = state["obj_ids"].index(m.obj_id)
                frame_out = state["non_cond_frames"].get(t) or state[
                    "cond_frames"
                ].get(t)
                if frame_out is None:
                    continue
                out_ids.append(m.obj_id)
                out_masks.append(frame_out["low_res_masks"][slot, 0])
            yield {
                "frame_idx": t,
                "obj_ids": out_ids,
                "masks": np.stack(out_masks) if out_masks else np.zeros((0, 1, 1)),
                "det_scores": det_scores,
            }
