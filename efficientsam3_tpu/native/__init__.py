"""ctypes bindings for the native host kernels (native/hostkernels.cpp).

Builds the shared library on first use with g++ (cached next to the
source); falls back to None if no compiler is available — callers must
handle `lib() is None` by using the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "hostkernels.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libhostkernels.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", so, src],
                check=True,
                capture_output=True,
            )
        _lib = ctypes.CDLL(so)
        _lib.cc_label.restype = ctypes.c_int32
        _lib.fill_holes.restype = None
        _lib.fill_holes_sprinkles.restype = None
        _lib.nms_greedy.restype = None
        _lib.edt.restype = None
        _lib.record_store_item_size.restype = ctypes.c_int64
        _lib.record_store_count.restype = ctypes.c_int64
        _lib.record_store_read.restype = ctypes.c_int32
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def cc_label(mask: np.ndarray):
    """(H, W) bool -> (labels int32 (H, W), num_components)."""
    l = lib()
    assert l is not None, "native library unavailable"
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.zeros(m.shape, np.int32)
    n = l.cc_label(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(m.shape[0]),
        ctypes.c_int32(m.shape[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, int(n)


def fill_holes(scores: np.ndarray, max_area: float, fill_value: float = 0.1,
               remove_sprinkles: bool = False, sprinkle_value: float = -0.1):
    """(..., H, W) float32 score maps -> holes (bg components, area <=
    max_area) patched to fill_value IN PLACE; optionally fg components
    smaller than min(total_fg // 2, max_area) set to sprinkle_value
    (reference sam3_tracker_utils.py:392 fill_holes + remove_sprinkles).
    scores must be contiguous float32; leading axes are flattened into the
    batch, which is processed in parallel threads."""
    l = lib()
    assert l is not None, "native library unavailable"
    assert scores.dtype == np.float32 and scores.flags.c_contiguous
    h, w = scores.shape[-2:]
    b = int(np.prod(scores.shape[:-2], dtype=np.int64)) if scores.ndim > 2 else 1
    l.fill_holes_sprinkles(
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(b), ctypes.c_int32(h), ctypes.c_int32(w),
        ctypes.c_float(max_area), ctypes.c_float(fill_value),
        ctypes.c_int32(1 if remove_sprinkles else 0),
        ctypes.c_float(sprinkle_value),
    )
    return scores


def nms_greedy(iou: np.ndarray, scores: np.ndarray, thresh: float):
    l = lib()
    assert l is not None, "native library unavailable"
    iou = np.ascontiguousarray(iou, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = iou.shape[0]
    keep = np.zeros(n, np.uint8)
    l.nms_greedy(
        iou.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n),
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def edt(mask: np.ndarray):
    l = lib()
    assert l is not None, "native library unavailable"
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.zeros(m.shape, np.float32)
    l.edt(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(m.shape[0]),
        ctypes.c_int32(m.shape[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


class RecordStore:
    """Fixed-item-size keyed binary store (stage-1 teacher embeddings).

    Layout: [count int64][item_size int64][items...]. Replaces the
    reference's TxtManager byte store (stage1/data/augmentation/manager.py).
    """

    def __init__(self, path: str):
        self.path = path
        l = lib()
        assert l is not None, "native library unavailable"
        self.item_size = int(l.record_store_item_size(path.encode()))
        self.count = int(l.record_store_count(path.encode()))
        if self.item_size < 0 or self.count < 0:
            raise IOError(f"invalid record store: {path}")

    def read(self, index: int) -> bytes:
        out = np.zeros(self.item_size, np.uint8)
        rc = lib().record_store_read(
            self.path.encode(),
            ctypes.c_int64(index),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(self.item_size),
        )
        if rc != 0:
            raise IOError(f"record_store_read failed rc={rc}")
        return out.tobytes()

    @staticmethod
    def write(path: str, items: list[bytes]):
        assert items and all(len(i) == len(items[0]) for i in items)
        with open(path, "wb") as f:
            np.asarray([len(items), len(items[0])], np.int64).tofile(f)
            for it in items:
                f.write(it)
