"""Video/image loading for inference.

Mirrors reference sam3/sam3/model/io_utils.py (JPEG-folder videos, async
prefetch loaders, fp16 CPU offload). This environment has no cv2/torchcodec,
so mp4 decoding is gated behind an optional import; JPEG/PNG frame folders
(the DAVIS/MOSE/SA-V layout) load through PIL with a threaded prefetcher.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Optional, Sequence

import numpy as np

FRAME_EXTS = (".jpg", ".jpeg", ".png")


def list_frame_files(path: str) -> list:
    files = [
        f for f in sorted(os.listdir(path)) if f.lower().endswith(FRAME_EXTS)
    ]
    if not files:
        raise FileNotFoundError(f"no image frames in {path}")
    return [os.path.join(path, f) for f in files]


def load_frame(path: str, resolution: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if resolution is not None:
        img = img.resize((resolution, resolution), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def load_video_frames(
    path: str,
    resolution: Optional[int] = None,
    offload_to_fp16: bool = False,
    max_frames: Optional[int] = None,
):
    """Load a video as (T, H, W, 3). `path` is a frame folder or an mp4
    (mp4 requires cv2/torchcodec; reference io_utils.py:29)."""
    if os.path.isdir(path):
        files = list_frame_files(path)[:max_frames]
        frames = np.stack([load_frame(f, resolution) for f in files])
    else:
        frames = _load_mp4(path, resolution, max_frames)
    if offload_to_fp16:
        frames = (frames.astype(np.float16) / 255.0)
    return frames


def _load_mp4(path, resolution, max_frames):
    try:
        import cv2  # optional
    except ImportError as e:
        raise ImportError(
            "mp4 decoding needs cv2 or torchcodec (not in this environment); "
            "extract frames to a JPEG folder instead"
        ) from e
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and len(frames) >= max_frames):
            break
        frame = frame[:, :, ::-1]
        if resolution is not None:
            frame = cv2.resize(frame, (resolution, resolution))
        frames.append(frame)
    cap.release()
    return np.stack(frames)


class AsyncFrameLoader:
    """Threaded frame prefetcher (reference AsyncImageFrameLoader
    io_utils.py:339): index access blocks only until that frame is decoded."""

    def __init__(self, frame_paths: Sequence[str], resolution: Optional[int] = None,
                 prefetch: int = 8, offload_to_fp16: bool = False,
                 keep_window: Optional[int] = None):
        """offload_to_fp16 stores decoded frames as normalized fp16 (halved
        host RAM, reference io_utils.py CPU-offload); keep_window evicts
        frames more than `keep_window` indices behind the newest access so
        long videos stream in bounded memory (re-decoded on re-access)."""
        self.paths = list(frame_paths)
        self.resolution = resolution
        self.offload_to_fp16 = offload_to_fp16
        self.keep_window = keep_window
        self._frames: dict[int, np.ndarray] = {}
        self._produced = -1
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._queue = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def __len__(self):
        return len(self.paths)

    def _decode(self, path):
        frame = load_frame(path, self.resolution)
        if self.offload_to_fp16:
            frame = frame.astype(np.float16) / 255.0
        return frame

    def _producer(self):
        for i, p in enumerate(self.paths):
            frame = self._decode(p)
            self._queue.put(None)  # backpressure slot
            with self._cv:
                self._frames[i] = frame
                self._produced = i
                self._cv.notify_all()

    def __getitem__(self, idx: int) -> np.ndarray:
        with self._cv:
            while idx not in self._frames:
                if idx <= self._produced:
                    # already evicted: synchronous re-decode
                    return self._decode(self.paths[idx])
                self._cv.wait(timeout=30)
            frame = self._frames[idx]
            if self.keep_window is not None:
                for k in [k for k in self._frames if k < idx - self.keep_window]:
                    del self._frames[k]
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass
        return frame
