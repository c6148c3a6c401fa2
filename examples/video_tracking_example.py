"""Interactive VOS example: click an object on frame 0, track it.

Equivalent of the reference's sam3_dense_video_tracking / tracker example
notebooks, over a JPEG frame folder (DAVIS/MOSE layout).

Run:  python examples/video_tracking_example.py <frames_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.build import build_efficientsam3_video_model
from efficientsam3_tpu.models.geometry import Prompt
from efficientsam3_tpu.video.io import load_video_frames
from efficientsam3_tpu.video.predictor import TrackerPredictor


def main():
    frames_dir = sys.argv[1] if len(sys.argv) > 1 else None
    image_model, tracker_core = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="m",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
    )

    rng = jax.random.PRNGKey(0)
    res = image_model.trunk.embed_size * 14
    img0 = jnp.zeros((1, res, res, 3))
    img_vars = image_model.init(
        rng, img0, jnp.zeros((1, 32), jnp.int32), Prompt.empty(1, 8, 8)
    )
    # tracker variables: random init here; for real use, load converted
    # reference weights via utils/convert_model.convert_tracker_core.
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    tracker_vars = init_tracker_variables(tracker_core, rng)

    encode = jax.jit(
        lambda v, img: image_model.apply(v, img, method=image_model.encode_image)
    )

    def encode_frame(img):
        out = encode(img_vars, img)
        return {"sam2_fpn": out["sam2_fpn"]}

    if frames_dir:
        frames = load_video_frames(frames_dir, resolution=res)
    else:
        frames = (np.random.rand(4, res, res, 3) * 255).astype(np.uint8)

    tracker = TrackerPredictor(tracker_core, tracker_vars, encode_frame)
    state = tracker.init_state(frames.astype(np.float32) / 255.0)
    tracker.add_new_points_or_box(
        state, 0, obj_id=1, points=[[res // 2, res // 2]], labels=[1]
    )
    for frame_idx, obj_ids, masks in tracker.propagate_in_video(state):
        areas = [int((m > 0).sum()) for m in masks]
        print(f"frame {frame_idx}: objects {list(obj_ids)} mask areas {areas}")


if __name__ == "__main__":
    main()
