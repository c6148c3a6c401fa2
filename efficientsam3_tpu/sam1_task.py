"""SAM1-task interactive predictor: single-image point/box segmentation via
the tracker's SAM heads (no memory).

Mirrors reference sam3/sam3/model/sam1_task_predictor.py:22
(SAM3InteractiveImagePredictor) and Sam3Image.predict_inst
(sam3_image.py:599): SAM2-neck features + no_mem_embed -> prompt encoder +
mask decoder; boxes become two corner points labeled 2/3. Used by the COCO
box/point-prompt mIoU eval (reference eval/eval_coco.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.interpolate import resize_bilinear
from efficientsam3_tpu.video.tracker import TrackerCore


class InteractiveImagePredictor:
    def __init__(
        self,
        core: TrackerCore,
        variables,
        encode_frame,  # (1, H, W, 3) -> {'sam2_fpn': [s0_raw, s1_raw, top]}
        max_points: int = 8,
    ):
        self.core = core
        self.variables = variables
        self.encode_frame = encode_frame
        self.max_points = max_points
        fs = core.feat_size

        def _predict(v, tokens, s0, s1, coords, labels, multimask):
            cond = core.apply(v, tokens, method=core.no_mem_features)
            pix = cond.reshape(tokens.shape[0], fs, fs, core.d_model)
            return core.apply(
                v, pix, coords, labels, (s0, s1), multimask,
                method=core.forward_sam_heads,
            )

        self._predict_jit = jax.jit(_predict, static_argnums=(6,))
        self._predict_batch_jit = None  # built lazily by predict_batch
        self._state = None

    @property
    def input_size(self):
        return self.core.image_size

    def set_image(self, image: np.ndarray):
        """image: (H, W, 3) uint8/float. Resizes to the model resolution."""
        h, w = image.shape[:2]
        img = jnp.asarray(image)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        r = self.input_size
        img = jax.image.resize(img, (r, r, 3), "linear", antialias=True)
        img = ((img - 0.5) / 0.5)[None]
        out = self.encode_frame(img)
        fpn = out["sam2_fpn"]
        s0, s1 = self.core.apply(
            self.variables, fpn[0], fpn[1],
            method=lambda m, a, b: m.sam_mask_decoder.high_res_convs(a, b),
        )
        fs = self.core.feat_size
        tokens = fpn[2].reshape(1, fs * fs, self.core.d_model)
        self._state = {"tokens": tokens, "s0": s0, "s1": s1, "orig_hw": (h, w)}

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,  # (P, 2) original pixels
        point_labels: Optional[np.ndarray] = None,  # (P,)
        box: Optional[np.ndarray] = None,  # (4,) xyxy original pixels
        multimask_output: bool = True,
    ):
        """Returns (masks (M, H, W) bool, iou_predictions (M,), low_res (M, 288, 288))."""
        if self._state is None:
            raise ValueError("call set_image first")
        h, w = self._state["orig_hw"]
        r = self.input_size
        sx, sy = r / w, r / h

        # Token count must match the reference exactly: n prompts + ONE
        # padding point (the SAM prompt encoder always appends a single pad
        # when boxes are absent, sam/prompt_encoder.py / tracker_base.py:283),
        # and the TwoWayTransformer attends to padding tokens, so extra pad
        # slots would change the numerics. Width varies only with the number
        # of prompt points (few distinct shapes; jit caches each).
        n_total = (2 if box is not None else 0) + (
            len(point_coords) if point_coords is not None else 0
        )
        width = max(n_total, 0) + 1
        pts = np.zeros((1, width, 2), np.float32)
        labs = -np.ones((1, width), np.int32)
        n = 0
        if box is not None:
            b = np.asarray(box, np.float32)
            pts[0, 0] = [b[0] * sx, b[1] * sy]
            pts[0, 1] = [b[2] * sx, b[3] * sy]
            labs[0, 0], labs[0, 1] = 2, 3
            n = 2
        if point_coords is not None:
            p = np.asarray(point_coords, np.float32) * np.asarray([sx, sy])
            pl = np.asarray(point_labels, np.int32)
            pts[0, n : n + len(p)] = p
            labs[0, n : n + len(p)] = pl

        heads = self._predict_jit(
            self.variables,
            self._state["tokens"], self._state["s0"], self._state["s1"],
            jnp.asarray(pts), jnp.asarray(labs), multimask_output,
        )
        low = heads["low_res_multimasks"] if multimask_output else heads["low_res_masks"]
        masks = np.asarray(resize_bilinear(low, (h, w)))[0]
        ious = np.asarray(heads["ious"])[0]
        return masks > 0, ious, np.asarray(low)[0]

    def predict_batch(self, point_coords: np.ndarray,
                      stability_offset: float = 1.0):
        """Batched single-point prompting against the cached image
        embedding — the AMG hot path (reference predict_torch over point
        batches, automatic_mask_generator.py:267-283).

        point_coords: (P, 2) MODEL-resolution pixels. Returns device
        arrays (fetch only what survives filtering):
          low       (P*3, hl, wl) f32 low-res mask logits
          iou       (P*3,) predicted IoUs
          stability (P*3,) stability scores (computed on device)
          boxes     (P*3, 4) xyxy in low-res pixel coords
          empty     (P*3,) True where the thresholded mask is empty
        """
        if self._state is None:
            raise ValueError("call set_image first")
        if self._predict_batch_jit is None:
            core = self.core

            @partial(jax.jit, static_argnums=(5,))
            def _batch(v, tokens, s0, s1, coords, n_pts, off=1.0):
                fs, d = core.feat_size, core.d_model
                toks = jnp.broadcast_to(tokens, (n_pts,) + tokens.shape[1:])
                s0b = jnp.broadcast_to(s0, (n_pts,) + s0.shape[1:])
                s1b = jnp.broadcast_to(s1, (n_pts,) + s1.shape[1:])
                cond = core.apply(v, toks, method=core.no_mem_features)
                pix = cond.reshape(n_pts, fs, fs, d)
                # one prompt point + the single pad slot (see predict())
                pts = jnp.concatenate(
                    [coords[:, None, :], jnp.zeros((n_pts, 1, 2))], axis=1
                )
                labs = jnp.concatenate(
                    [jnp.ones((n_pts, 1), jnp.int32),
                     -jnp.ones((n_pts, 1), jnp.int32)], axis=1,
                )
                heads = core.apply(
                    v, pix, pts, labs, (s0b, s1b), True,
                    method=core.forward_sam_heads,
                )
                low = heads["low_res_multimasks"]
                P, K, hl, wl = low.shape
                flat = low.reshape(P * K, hl, wl).astype(jnp.float32)
                iou = heads["ious"].reshape(P * K)
                hi = (flat > off).sum((-1, -2)).astype(jnp.float32)
                lo = (flat > -off).sum((-1, -2)).astype(jnp.float32)
                stability = hi / jnp.maximum(lo, 1.0)
                fg = flat > 0
                any_x = fg.any(axis=1)
                any_y = fg.any(axis=2)
                xs = jnp.arange(wl)
                ys = jnp.arange(hl)
                big = jnp.int32(1 << 20)
                x0 = jnp.min(jnp.where(any_x, xs, big), axis=1)
                x1 = jnp.max(jnp.where(any_x, xs, -1), axis=1) + 1
                y0 = jnp.min(jnp.where(any_y, ys, big), axis=1)
                y1 = jnp.max(jnp.where(any_y, ys, -1), axis=1) + 1
                empty = ~fg.any((-1, -2))
                boxes = jnp.stack(
                    [jnp.where(empty, 0, x0), jnp.where(empty, 0, y0),
                     jnp.where(empty, 0, x1), jnp.where(empty, 0, y1)],
                    axis=-1,
                ).astype(jnp.float32)
                return flat, iou, stability, boxes, empty

            self._predict_batch_jit = _batch
        st = self._state
        coords = jnp.asarray(point_coords, jnp.float32)
        return self._predict_batch_jit(
            self.variables, st["tokens"], st["s0"], st["s1"], coords,
            int(coords.shape[0]), jnp.float32(stability_offset),
        )
