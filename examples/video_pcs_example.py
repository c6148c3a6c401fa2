"""Video PCS example: "track every <concept>" over a frame folder.

Equivalent of the reference's sam3_video_predictor_example /
efficientsam3_litetext_video_predictor_example notebooks: a text prompt is
grounded by the image detector on every frame, detections are associated
with tracked masklets, and the SAM2-style streaming tracker propagates
each object's memory — all per-frame steps are single jitted TPU programs.

Run:  python examples/video_pcs_example.py <frames_dir> "<concept>" [ckpt.pt]
With no checkpoint the model is randomly initialized (pipeline dry run).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.build import build_efficientsam3_video_model
from efficientsam3_tpu.models.geometry import Prompt
from efficientsam3_tpu.processor import Sam3Processor
from efficientsam3_tpu.video.io import load_video_frames
from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor
from efficientsam3_tpu.video.predictor import TrackerPredictor


def main():
    frames_dir = sys.argv[1]
    concept = sys.argv[2] if len(sys.argv) > 2 else "person"
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None

    image_model, tracker_core = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="m",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    res = 1008
    img0 = jnp.zeros((1, res, res, 3), jnp.float32)
    variables = image_model.init(
        rng, img0, jnp.zeros((1, 32), jnp.int32), Prompt.empty(1, 8, 8)
    )
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    tvars = init_tracker_variables(tracker_core, rng)
    if ckpt is not None:
        from efficientsam3_tpu.utils.convert_model import convert_image_model
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict

        variables = convert_image_model(load_torch_state_dict(ckpt), variables)

    proc = Sam3Processor(image_model, variables, resolution=res)

    def encode_frame(img):
        return image_model.apply(variables, img, method=image_model.encode_image)

    def detector(frame, text_state):
        # per-frame grounding of the text prompt, host-thresholded.
        # `frame` arrives normalized at model resolution, shape (H, W, 3).
        state = dict(text_state)
        state["original_height"], state["original_width"] = frame.shape[:2]
        state["image_feats"] = proc._encode_image(
            proc.variables, jnp.asarray(frame, jnp.float32)[None]
        )
        state = proc._forward_grounding(state)
        return {"masks": state["masks"], "scores": state["scores"],
                "boxes": state["boxes"]}

    # encode the concept once; reused on every frame
    text_state = proc.set_image(np.zeros((res, res, 3), np.uint8))
    text_state = proc.set_text_prompt(concept, text_state)

    tracker = TrackerPredictor(tracker_core, tvars, encode_frame)
    pipe = VideoPCSPredictor(detector, tracker, VideoPCSConfig())

    frames = load_video_frames(frames_dir, resolution=res)
    frames = (np.asarray(frames, np.float32) / 255.0 - 0.5) / 0.5
    for t, out in enumerate(pipe.run_video(frames, text_state=text_state)):
        print(f"frame {t}: {len(out['obj_ids'])} objects "
              f"{[int(i) for i in out['obj_ids']]}")


if __name__ == "__main__":
    main()
