"""Video det+track pipeline tests with a synthetic detector (CPU):
smoke, hotstart retro-emission, mid-video instance interactivity, and
bounded host memory on long videos."""

import numpy as np

import jax
import jax.numpy as jnp

from test_tracker_smoke import _tiny_setup


def _make_pipe(obj_slots=4, cfg=None):
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor
    from efficientsam3_tpu.video.predictor import TrackerPredictor

    core, variables, *_ = _tiny_setup()
    fs = core.feat_size
    # random weights give object_score_logits < 0, which saturates all masks
    # to NO_OBJ (-1024) and defeats association; bias the object-score head
    # positive so the synthetic rollouts behave like a trained tracker
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    head = variables["params"]["sam_mask_decoder"]["pred_obj_score_head"]
    last = f"layers_{len(head) - 1}"
    head[last] = dict(head[last], bias=head[last]["bias"] + 10.0)

    def encode_frame(img):
        key = jax.random.PRNGKey(3)
        s0 = jax.random.normal(key, (1, 4 * fs, 4 * fs, 32)) * 0.1
        s1 = jax.random.normal(key, (1, 2 * fs, 2 * fs, 32)) * 0.1
        top = jax.random.normal(key, (1, fs, fs, 32)) * 0.1 + img.mean() * 0.01
        return {"sam2_fpn": [s0, s1, top]}

    tracker = TrackerPredictor(
        core, variables, encode_frame, obj_slots=obj_slots, max_point_prompts=4
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

    pipe = VideoPCSPredictor(detector, tracker, cfg)
    return pipe, tracker


def _frames(n, size=64):
    frames = np.zeros((n, size, size, 3), np.float32)
    for t in range(n):
        frames[t, 0, 0, 0] = t / 100.0
    return frames


def test_video_pcs_pipeline():
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig

    cfg = VideoPCSConfig(obj_slots=4, hotstart_delay=0, new_det_thresh=0.5)
    pipe, _ = _make_pipe(cfg=cfg)
    outs = list(pipe.run_video(_frames(4), text_state=None))
    assert len(outs) == 4
    assert len(outs[0]["obj_ids"]) >= 1  # spawned on frame 0 (no hotstart)
    ids = {i for o in outs for i in o["obj_ids"]}
    assert len(ids) >= 1
    for o in outs:
        if o["obj_ids"]:
            assert np.isfinite(o["masks"]).all()


def test_hotstart_retro_emission():
    """With hotstart + confirmation on, the masklet confirmed on frame 2 is
    retroactively emitted for frames 0 and 1 (ref
    sam3_video_inference.py:282-317)."""
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig

    cfg = VideoPCSConfig(
        obj_slots=4, hotstart_delay=4, new_det_thresh=0.5,
        masklet_confirmation_enable=True,
        masklet_confirmation_consecutive_det_thresh=3,
        fill_hole_area=0,
        # random-weight tracker masks barely overlap the synthetic squares;
        # loose thresholds keep the det<->trk association flowing (the
        # reference uses loose assoc thresholds like 0.1 too)
        assoc_iou_thresh=0.0, trk_assoc_iou_thresh=0.0,
    )
    pipe, _ = _make_pipe(cfg=cfg)
    outs = list(pipe.run_video(_frames(6), text_state=None))
    assert [o["frame_idx"] for o in outs] == list(range(6))
    # the object becomes confirmed after 3 matched frames; frames 0-1 are
    # emitted AFTER that verdict and must already include it
    assert len(outs[0]["obj_ids"]) >= 1, "retro-emission missing on frame 0"
    assert len(outs[1]["obj_ids"]) >= 1


def test_hotstart_removes_spurious_masklet():
    """A masklet spawned by a one-frame spurious detection is removed via the
    unmatched-within-hotstart rule and never emitted (ref
    sam3_video_base.py:1377-1392)."""
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor

    pipe, tracker = _make_pipe()

    def detector(frame, text_state):
        t = int(frame[0, 0, 0] * 100)
        masks, scores = [], []
        m = np.zeros((64, 64), bool)
        m[10 : 30, 10 : 30] = True
        masks.append(m)
        scores.append(0.9)
        if t == 0:  # spurious far-away detection only on frame 0
            g = np.zeros((64, 64), bool)
            g[50:60, 50:60] = True
            masks.append(g)
            scores.append(0.9)
        return {
            "masks": np.stack(masks),
            "scores": np.asarray(scores),
            "boxes": np.zeros((len(masks), 4)),
        }

    cfg = VideoPCSConfig(
        obj_slots=4, hotstart_delay=6, hotstart_unmatch_thresh=3,
        new_det_thresh=0.5, fill_hole_area=0,
    )
    pipe = VideoPCSPredictor(detector, pipe.tracker, cfg)
    outs = list(pipe.run_video(_frames(8), text_state=None))
    all_ids = {i for o in outs for i in o["obj_ids"]}
    # the spurious object (id 1) must have been removed retroactively
    assert 1 not in all_ids or len(all_ids) == 1


def test_mid_video_instance_interactivity():
    """A click on a tracked object mid-video re-conditions its memory and
    changes subsequent masks (ref sam3_video_inference.py:1415)."""
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig

    cfg = VideoPCSConfig(
        obj_slots=4, hotstart_delay=0, new_det_thresh=0.5, fill_hole_area=0
    )
    frames = _frames(6)

    pipe, _ = _make_pipe(cfg=cfg)
    session = pipe.init_session(frames, None)
    base = {o["frame_idx"]: o for o in pipe.propagate(session)}

    pipe2, _ = _make_pipe(cfg=cfg)
    session2 = pipe2.init_session(frames, None)
    gen = pipe2.propagate(session2)
    outs2 = {}
    for o in gen:
        outs2[o["frame_idx"]] = o
        if o["frame_idx"] == 2:
            oid = o["obj_ids"][0]
            pipe2.add_instance_points(
                session2, 2, oid, points=np.array([[48.0, 48.0]]), labels=[1]
            )
    # masks after the click differ from the unclicked run
    later = max(outs2)
    assert outs2[later]["masks"].shape == base[later]["masks"].shape
    assert not np.allclose(outs2[later]["masks"], base[later]["masks"])


def test_long_video_memory_bounded():
    """Past non-cond spatial memories are trimmed, so host state stays
    bounded over long videos (ref sam3_tracker_base.py:1069-1106)."""
    from efficientsam3_tpu.video.predictor import TrackerPredictor

    pipe, tracker = _make_pipe()
    n = 60
    frames = _frames(n)
    state = tracker.init_state(list(frames))
    tracker.add_new_points_or_box(
        state, 0, obj_id=1, points=np.array([[20.0, 20.0]]), labels=[1]
    )
    for _ in tracker.propagate_in_video(state):
        pass
    with_mem = [
        t for t, o in state["non_cond_frames"].items() if "maskmem" in o
    ]
    assert len(with_mem) <= tracker.core.num_maskmem * tracker.stride + 2, (
        f"unbounded spatial memories: {sorted(with_mem)}"
    )
    # small per-frame outputs (pointers/scores) are retained
    assert len(state["non_cond_frames"]) == n - 1


def test_frame_chunked_detection():
    """detector_batch + frame_chunk: detections prefetched in fixed-width
    batched calls (P2 frame-parallel contract, sam3_image.py:701)."""
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor

    pipe0, tracker = _make_pipe()
    calls = []

    def detector_batch(frames, text_state):
        calls.append(frames.shape)
        outs = []
        for f in np.asarray(frames):
            t = int(f[0, 0, 0] * 100)
            m = np.zeros((1, 64, 64), bool)
            m[0, 10 + t : 30 + t, 10 + t : 30 + t] = True
            outs.append(
                {"masks": m, "scores": np.asarray([0.9]),
                 "boxes": np.zeros((1, 4))}
            )
        return outs

    cfg = VideoPCSConfig(obj_slots=4, hotstart_delay=0, new_det_thresh=0.5,
                         fill_hole_area=0)
    pipe = VideoPCSPredictor(
        lambda *a: None, tracker, cfg,
        detector_batch=detector_batch, frame_chunk=4,
    )
    outs = list(pipe.run_video(_frames(6), text_state=None))
    assert len(outs) == 6
    # 6 frames at chunk 4 -> exactly 2 batched calls, both fixed width 4
    assert calls == [(4, 64, 64, 3), (4, 64, 64, 3)]
    assert len(outs[0]["obj_ids"]) >= 1


def test_detector_nms_in_pipeline():
    """Per-frame detector mask-NMS (reference det_nms_thresh,
    sam3_image.py:817-831): overlapping duplicate detections collapse to one
    masklet; with NMS off both spawn."""
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor

    _, tracker = _make_pipe()

    def dup_detector(frame, text_state):
        m = np.zeros((2, 64, 64), bool)
        m[0, 10:30, 10:30] = True
        m[1, 11:31, 11:31] = True  # ~0.8 IoU duplicate
        return {"masks": m, "scores": np.asarray([0.9, 0.85]),
                "boxes": np.zeros((2, 4))}

    base = dict(obj_slots=4, hotstart_delay=0, new_det_thresh=0.5,
                fill_hole_area=0)
    pipe = VideoPCSPredictor(
        dup_detector, tracker, VideoPCSConfig(nms_iou_thresh=0.7, **base)
    )
    outs = list(pipe.run_video(_frames(1), text_state=None))
    assert len(outs[0]["obj_ids"]) == 1

    _, tracker2 = _make_pipe()
    pipe_off = VideoPCSPredictor(
        dup_detector, tracker2, VideoPCSConfig(nms_iou_thresh=0.0, **base)
    )
    outs_off = list(pipe_off.run_video(_frames(1), text_state=None))
    assert len(outs_off[0]["obj_ids"]) == 2
