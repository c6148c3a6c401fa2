"""EfficientSam3System: one handle over the detector + tracker.

Bundles what the reference wires through `enable_inst_interactivity`
(model_builder.py:722-726: Sam3Image + SAM3InteractiveImagePredictor sharing
the SAM2 neck) and the video predictor builders: a single object exposing

  .processor()             text/box/point image PCS  (Sam3Processor)
  .interactive_predictor() SAM1-task point/box masks (predict_inst path)
  .tracker_predictor()     VOS streaming tracker
  .video_predictor()       full video PCS (detect + track)
  .server()                session-based serving facade

All share one jitted encode_image; checkpoints load through
utils/convert_model (detector) + convert_tracker_core (tracker.* keys).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class EfficientSam3System:
    def __init__(
        self,
        image_model,
        image_variables,
        tracker_core=None,
        tracker_variables=None,
        context_length: Optional[int] = None,
        bpe_path: Optional[str] = None,
    ):
        self.image_model = image_model
        self.image_variables = image_variables
        self.tracker_core = tracker_core
        self.tracker_variables = tracker_variables
        self.context_length = context_length or image_model.text_context_length
        self.bpe_path = bpe_path
        self._encode_image = jax.jit(
            lambda v, img: image_model.apply(v, img, method=image_model.encode_image)
        )

    # ------------------------------------------------------------------
    def encode_frame(self, img):
        """(1, H, W, 3) normalized -> dict with 'sam2_fpn' for the tracker."""
        out = self._encode_image(self.image_variables, img)
        if "sam2_fpn" not in out:
            raise ValueError(
                "model built without the SAM2 neck; pass "
                "enable_inst_interactivity=True to the builder"
            )
        return out

    def processor(self, **kwargs):
        from efficientsam3_tpu.processor import Sam3Processor

        return Sam3Processor(
            self.image_model,
            self.image_variables,
            context_length=self.context_length,
            bpe_path=self.bpe_path,
            **kwargs,
        )

    def interactive_predictor(self, **kwargs):
        from efficientsam3_tpu.sam1_task import InteractiveImagePredictor

        self._require_tracker()
        return InteractiveImagePredictor(
            self.tracker_core, self.tracker_variables, self.encode_frame, **kwargs
        )

    def tracker_predictor(self, **kwargs):
        from efficientsam3_tpu.video.predictor import TrackerPredictor

        self._require_tracker()
        return TrackerPredictor(
            self.tracker_core, self.tracker_variables, self.encode_frame, **kwargs
        )

    def video_predictor(self, pcs_config=None, **kwargs):
        from efficientsam3_tpu.video.pipeline import VideoPCSPredictor

        proc = self.processor()

        def detector(frame, text_state):
            import numpy as np

            state = dict(text_state or {})
            state = proc.set_image(np.asarray(frame), state)
            if "text" not in state:
                proc._ensure_text(state)
            state = proc._forward_grounding(state)
            return {
                "masks": np.asarray(state["masks"]),
                "scores": np.asarray(state["scores"]),
                "boxes": np.asarray(state["boxes"]),
            }

        return VideoPCSPredictor(detector, self.tracker_predictor(**kwargs), pcs_config)

    def server(self, **kwargs):
        from efficientsam3_tpu.video.server import VideoPredictorServer

        return VideoPredictorServer(self.tracker_predictor(**kwargs))

    def _require_tracker(self):
        if self.tracker_core is None or self.tracker_variables is None:
            raise ValueError("system built without a tracker core/variables")
