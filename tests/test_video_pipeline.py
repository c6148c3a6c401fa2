"""Video det+track pipeline smoke test with a synthetic detector (CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from test_tracker_smoke import _tiny_setup


def test_video_pcs_pipeline():
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor
    from efficientsam3_tpu.video.predictor import TrackerPredictor

    core, variables, *_ = _tiny_setup()
    fs = core.feat_size

    def encode_frame(img):
        key = jax.random.PRNGKey(3)
        s0 = jax.random.normal(key, (1, 4 * fs, 4 * fs, 32)) * 0.1
        s1 = jax.random.normal(key, (1, 2 * fs, 2 * fs, 32)) * 0.1
        top = jax.random.normal(key, (1, fs, fs, 32)) * 0.1 + img.mean() * 0.01
        return {"sam2_fpn": [s0, s1, top]}

    tracker = TrackerPredictor(
        core, variables, encode_frame, obj_slots=4, max_point_prompts=4
    )

    def detector(frame, text_state):
        # synthetic: one moving square detection per frame
        t = int(frame[0, 0, 0] * 100)  # frame index smuggled in pixel 0
        m = np.zeros((1, 64, 64), bool)
        m[0, 10 + t : 30 + t, 10 + t : 30 + t] = True
        return {
            "masks": m,
            "scores": np.asarray([0.9]),
            "boxes": np.asarray([[10.0 + t, 10 + t, 30 + t, 30 + t]]),
        }

    frames = np.zeros((4, 64, 64, 3), np.float32)
    for t in range(4):
        frames[t, 0, 0, 0] = t / 100.0

    cfg = VideoPCSConfig(
        obj_slots=4, hotstart_delay=0, hotstart_min_hits=1, new_det_thresh=0.5
    )
    pipe = VideoPCSPredictor(detector, tracker, cfg)
    outs = list(pipe.run_video(frames, text_state=None))
    assert len(outs) == 4
    # an object is spawned on frame 0 and reported from frame 1 onwards
    assert len(outs[1]["obj_ids"]) >= 1
    ids = {i for o in outs for i in o["obj_ids"]}
    assert len(ids) >= 1
    for o in outs[1:]:
        if o["obj_ids"]:
            assert np.isfinite(o["masks"]).all()
