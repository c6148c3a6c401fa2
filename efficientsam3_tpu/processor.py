"""Sam3Processor: user-facing stateful inference API.

Mirrors reference sam3/sam3/model/sam3_image_processor.py:14 — set_image /
set_text_prompt / add_geometric_prompt / add_point_prompt /
reset_all_prompts, with the same preprocessing (resize to 1008x1008,
normalize mean/std 0.5) and postprocessing (sigmoid(logits) x
sigmoid(presence) > threshold, box rescale to original size, bilinear mask
upsample + 0.5 binarization).

TPU-first design: three cached jitted programs (encode_image, encode_text,
ground) with fixed shapes — adding prompts re-runs only `ground`; image and
text features stay on device between calls. Thresholding/filtering runs on
host over the fixed 200-query outputs (dynamic shapes never enter the
compiled graph).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy
from efficientsam3_tpu.models.geometry import Prompt
from efficientsam3_tpu.ops.interpolate import resize_bilinear
from efficientsam3_tpu.utils.tokenizer import ClipTokenizer

MEAN = 0.5
STD = 0.5


class Sam3Processor:
    def __init__(
        self,
        model,
        params,
        resolution: int = 1008,
        confidence_threshold: float = 0.5,
        bpe_path: Optional[str] = None,
        max_boxes: int = 8,
        max_points: int = 8,
        context_length: Optional[int] = None,
    ):
        self.model = model
        self.variables = params if "params" in params else {"params": params}
        self.resolution = resolution
        self.confidence_threshold = confidence_threshold
        self.max_boxes = max_boxes
        self.max_points = max_points
        self.context_length = context_length or model.text_context_length
        self.tokenizer = ClipTokenizer(bpe_path)

        self._encode_image = jax.jit(
            lambda v, img: model.apply(v, img, method=model.encode_image)
        )
        self._encode_text = jax.jit(
            lambda v, tok: model.apply(v, tok, method=model.encode_text)
        )
        self._ground = jax.jit(
            lambda v, fpn, pos, tm, tmask, prompt: model.apply(
                v, fpn, pos, tm, tmask, prompt, method=model.ground
            )
        )

    # ------------------------------------------------------------------

    def preprocess(self, image: np.ndarray) -> jnp.ndarray:
        """HWC uint8/float -> (1, R, R, 3) normalized. Antialiased bilinear
        resize (torchvision v2.Resize default)."""
        img = jnp.asarray(image)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        img = jax.image.resize(
            img, (self.resolution, self.resolution, img.shape[-1]), "linear",
            antialias=True,
        )
        img = (img - MEAN) / STD
        return img[None]

    def set_image(self, image: np.ndarray, state: Optional[dict] = None) -> dict:
        state = state if state is not None else {}
        state["original_height"], state["original_width"] = image.shape[:2]
        img = self.preprocess(image)
        state["image_feats"] = self._encode_image(self.variables, img)
        return state

    def set_image_batch(self, images, state: Optional[dict] = None) -> dict:
        """Batched variant (reference sam3_image_processor.py:79): one
        encode over a stacked batch; grounding then runs batched too."""
        state = state if state is not None else {}
        state["original_heights"] = [im.shape[0] for im in images]
        state["original_widths"] = [im.shape[1] for im in images]
        batch = jnp.concatenate([self.preprocess(im) for im in images], axis=0)
        state["image_feats"] = self._encode_image(self.variables, batch)
        state["batch_size"] = len(images)
        return state

    def _empty_prompt(self):
        return Prompt.empty(1, self.max_boxes, self.max_points)

    def set_text_prompt(self, prompt: str, state: dict) -> dict:
        if "image_feats" not in state:
            raise ValueError("call set_image before set_text_prompt")
        tokens = jnp.asarray(self.tokenizer([prompt], self.context_length))
        state["text"] = self._encode_text(self.variables, tokens)
        state.setdefault("geometric_prompt", self._empty_prompt())
        return self._forward_grounding(state)

    def _ensure_text(self, state: dict):
        if "text" not in state:
            # geometry-only mode uses the "visual" dummy text prompt
            # (reference sam3_image_processor.py:140-145)
            tokens = jnp.asarray(self.tokenizer(["visual"], self.context_length))
            state["text"] = self._encode_text(self.variables, tokens)
        state.setdefault("geometric_prompt", self._empty_prompt())
        state.setdefault("num_boxes", 0)
        state.setdefault("num_points", 0)

    def add_geometric_prompt(self, box, label: bool, state: dict) -> dict:
        """box: normalized [cx, cy, w, h]."""
        if "image_feats" not in state:
            raise ValueError("call set_image before add_geometric_prompt")
        self._ensure_text(state)
        slot = state["num_boxes"]
        if slot >= self.max_boxes:
            raise ValueError(f"too many box prompts (max {self.max_boxes})")
        state["geometric_prompt"] = state["geometric_prompt"].with_box(
            0, slot, np.asarray(box, np.float32), int(label)
        )
        state["num_boxes"] = slot + 1
        return self._forward_grounding(state)

    def add_point_prompt(self, point, label: int, state: dict) -> dict:
        """point: [x, y] pixel coords in the ORIGINAL image."""
        if "image_feats" not in state:
            raise ValueError("call set_image before add_point_prompt")
        self._ensure_text(state)
        slot = state["num_points"]
        if slot >= self.max_points:
            raise ValueError(f"too many point prompts (max {self.max_points})")
        xy = np.asarray(
            [point[0] / state["original_width"], point[1] / state["original_height"]],
            np.float32,
        )
        state["geometric_prompt"] = state["geometric_prompt"].with_point(
            0, slot, xy, int(label)
        )
        state["num_points"] = slot + 1
        return self._forward_grounding(state)

    def reset_all_prompts(self, state: dict):
        for k in ("text", "geometric_prompt", "num_boxes", "num_points",
                  "boxes", "masks", "masks_logits", "scores"):
            state.pop(k, None)

    def set_confidence_threshold(self, threshold: float, state: Optional[dict] = None):
        self.confidence_threshold = threshold
        if state is not None and "boxes" in state:
            return self._forward_grounding(state)
        return state

    # ------------------------------------------------------------------

    def _forward_grounding(self, state: dict) -> dict:
        if "batch_size" in state:
            return self._forward_grounding_batch(state)
        feats = state["image_feats"]
        tm, tmask = state["text"]
        out = self._ground(
            self.variables, feats["fpn"], feats["pos"], tm, tmask,
            state["geometric_prompt"],
        )
        logits = np.asarray(out["pred_logits"])[0, :, 0]  # (NQ,)
        presence = jax.nn.sigmoid(np.asarray(out["presence_logit_dec"]))[0]
        probs = 1.0 / (1.0 + np.exp(-logits)) * float(presence)
        keep = probs > self.confidence_threshold

        boxes_c = np.asarray(out["pred_boxes"])[0][keep]
        masks_lo = np.asarray(out["pred_masks"])[0][keep]

        h, w = state["original_height"], state["original_width"]
        boxes = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(boxes_c))) * np.asarray(
            [w, h, w, h], np.float32
        )
        if masks_lo.shape[0] > 0:
            masks_logits = np.asarray(
                resize_bilinear(jnp.asarray(masks_lo)[:, None], (h, w))
            )[:, 0]
        else:
            masks_logits = np.zeros((0, h, w), np.float32)
        masks_prob = 1.0 / (1.0 + np.exp(-masks_logits))

        state["scores"] = probs[keep]
        state["boxes"] = boxes
        state["masks_logits"] = masks_prob
        state["masks"] = masks_prob > 0.5
        return state

    def _forward_grounding_batch(self, state: dict) -> dict:
        """Batched grounding (reference get_masks_batch): reuses the cached
        single-image `ground` program per image (host loop — each image has
        its own original size, so upsampling is per-image anyway) and
        returns per-image lists."""
        feats = state["image_feats"]
        tm, tmask = state["text"]
        prompt = state["geometric_prompt"]
        scores, boxes_all, masks_all, masks_bin = [], [], [], []
        for i in range(state["batch_size"]):
            # fpn levels are (B, H, W, C); pos levels are unbatched (H, W, C)
            fpn_i = [lvl[i : i + 1] for lvl in feats["fpn"]]
            out = self._ground(self.variables, fpn_i, feats["pos"], tm, tmask, prompt)
            logits = np.asarray(out["pred_logits"])[0, :, 0]
            presence = 1.0 / (1.0 + np.exp(-np.asarray(out["presence_logit_dec"])[0]))
            probs = 1.0 / (1.0 + np.exp(-logits)) * float(presence)
            keep = probs > self.confidence_threshold
            boxes_c = np.asarray(out["pred_boxes"])[0][keep]
            masks_lo = np.asarray(out["pred_masks"])[0][keep]
            h = state["original_heights"][i]
            w = state["original_widths"][i]
            boxes = np.asarray(
                box_cxcywh_to_xyxy(jnp.asarray(boxes_c))
            ) * np.asarray([w, h, w, h], np.float32)
            if masks_lo.shape[0] > 0:
                mprob = 1.0 / (
                    1.0
                    + np.exp(
                        -np.asarray(
                            resize_bilinear(jnp.asarray(masks_lo)[:, None], (h, w))
                        )[:, 0]
                    )
                )
            else:
                mprob = np.zeros((0, h, w), np.float32)
            scores.append(probs[keep])
            boxes_all.append(boxes)
            masks_all.append(mprob)
            masks_bin.append(mprob > 0.5)
        state["scores"] = scores
        state["boxes"] = boxes_all
        state["masks_logits"] = masks_all
        state["masks"] = masks_bin
        return state
