"""Video IO + predictor-server session tests (tiny tracker)."""

import numpy as np
import pytest

import jax

from test_tracker_smoke import _tiny_setup


def test_frame_folder_and_async_loader(tmp_path):
    from PIL import Image

    from efficientsam3_tpu.video.io import AsyncFrameLoader, load_video_frames

    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            (rng.random((32, 48, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / f"{i:05d}.jpg")
    frames = load_video_frames(str(tmp_path))
    assert frames.shape == (4, 32, 48, 3)
    frames_r = load_video_frames(str(tmp_path), resolution=16)
    assert frames_r.shape == (4, 16, 16, 3)

    loader = AsyncFrameLoader(
        [str(tmp_path / f"{i:05d}.jpg") for i in range(4)], resolution=16
    )
    assert len(loader) == 4
    assert loader[3].shape == (16, 16, 3)
    assert loader[0].shape == (16, 16, 3)


def test_predictor_server_sessions():
    from efficientsam3_tpu.video.predictor import TrackerPredictor
    from efficientsam3_tpu.video.server import VideoPredictorServer

    core, variables, *_ = _tiny_setup()
    fs = core.feat_size

    def encode_frame(img):
        key = jax.random.PRNGKey(3)
        return {
            "sam2_fpn": [
                jax.random.normal(key, (1, 4 * fs, 4 * fs, 32)) * 0.1,
                jax.random.normal(key, (1, 2 * fs, 2 * fs, 32)) * 0.1,
                jax.random.normal(key, (1, fs, fs, 32)) * 0.1 + img.mean() * 0.01,
            ]
        }

    tracker = TrackerPredictor(
        core, variables, encode_frame, obj_slots=2, max_point_prompts=4
    )
    server = VideoPredictorServer(tracker)
    frames = np.random.default_rng(1).random((3, 64, 64, 3)).astype(np.float32)
    sid = server.start_session(frames)
    server.add_points(sid, 0, obj_id=1, points=[[20, 20]], labels=[1])
    outs = list(server.propagate_in_video(sid))
    assert [o["frame_idx"] for o in outs] == [0, 1, 2]
    stats = server.session_stats()
    assert stats["num_sessions"] == 1
    assert stats["sessions"][sid]["num_objects"] == 1
    server.close_session(sid)
    assert server.session_stats()["num_sessions"] == 0
    try:
        server.add_points(sid, 0, 1, points=[[1, 1]], labels=[1])
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_async_loader_offload_and_bounded_window(tmp_path):
    """fp16 CPU-offload (halved host RAM, reference io_utils.py) and
    keep_window eviction with synchronous re-decode on re-access."""
    from PIL import Image

    from efficientsam3_tpu.video.io import AsyncFrameLoader

    rng = np.random.default_rng(1)
    n = 8
    for i in range(n):
        Image.fromarray(
            (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / f"{i:05d}.jpg")
    paths = [str(tmp_path / f"{i:05d}.jpg") for i in range(n)]

    loader = AsyncFrameLoader(
        paths, offload_to_fp16=True, keep_window=2, prefetch=2
    )
    first = loader[0]
    assert first.dtype == np.float16 and 0.0 <= first.max() <= 1.0
    for i in range(1, n):
        assert loader[i].dtype == np.float16
    # frames more than keep_window behind the newest access were evicted
    with loader._lock:
        assert all(k >= n - 1 - 2 for k in loader._frames)
    # evicted frame re-decodes synchronously and matches the original
    again = loader[0]
    np.testing.assert_array_equal(again, first)


def _write_mp4(path, n_frames=8, h=48, w=64):
    cv2 = pytest.importorskip("cv2")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (w, h))
    assert wr.isOpened()
    for i in range(n_frames):
        fr = np.zeros((h, w, 3), np.uint8)
        fr[:, :, 2] = i * 25  # R channel ramps per frame (BGR writer)
        wr.write(fr)
    wr.release()


def test_mp4_round_trip(tmp_path):
    """mp4 decode path (reference io_utils.py:29 cv2 loader): synthesize,
    load whole, check frame count + per-frame content + options."""
    from efficientsam3_tpu.video.io import load_video_frames

    path = str(tmp_path / "clip.mp4")
    _write_mp4(path, n_frames=8)
    frames = load_video_frames(path)
    assert frames.shape == (8, 48, 64, 3) and frames.dtype == np.uint8
    # R ramp survives the codec (lossy: generous tolerance)
    r_means = frames[..., 0].mean(axis=(1, 2))
    assert abs(r_means[0] - 0) < 16 and abs(r_means[7] - 175) < 16
    assert np.all(np.diff(r_means) > 0)

    limited = load_video_frames(path, max_frames=3, resolution=32)
    assert limited.shape == (3, 32, 32, 3)

    fp16 = load_video_frames(path, max_frames=2, offload_to_fp16=True)
    assert fp16.dtype == np.float16 and fp16.max() <= 1.0


def test_mp4_streaming_reader(tmp_path):
    """Mp4FrameReader (TorchCodec-streaming analog, io_utils.py:486):
    in-order access with bounded keep_window, eviction raises IndexError."""
    from efficientsam3_tpu.video.io import Mp4FrameReader

    path = str(tmp_path / "clip.mp4")
    _write_mp4(path, n_frames=10)
    reader = Mp4FrameReader(path, keep_window=3, prefetch=2)
    means = [reader[i][..., 0].mean() for i in range(10)]
    assert np.all(np.diff(means) > 0)
    assert reader.num_frames_decoded == 10
    with pytest.raises(IndexError):
        reader[0]  # evicted (keep_window=3)
    with pytest.raises(IndexError):
        reader[10]  # past the end
