"""Tracing, metering and logging.

Replaces the reference's observability stack (SURVEY §5.1/§5.5):
torch.profiler.record_function spans -> jax.profiler traces + named scopes
around the same detector phases; stage meters (loss/time/memory/ETA) ->
Meter/MeterBank; shape-logging wrapper (perflib/compile.py:53, recompile
debugging) -> a jit wrapper that records novel input-shape combos.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Optional

import jax

LOG = logging.getLogger("efficientsam3_tpu")
if not LOG.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    )
    LOG.addHandler(_h)
    LOG.setLevel(logging.INFO)


@contextlib.contextmanager
def trace_span(name: str):
    """Named profiler span (maps to torch.profiler.record_function spans
    around detector phases, sam3_image.py:449-817)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Meter:
    """Running average meter (reference stage1/my_meter.py)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0
        self.last = 0.0

    def update(self, value: float, n: int = 1):
        self.last = float(value)
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MeterBank:
    def __init__(self):
        self.meters = defaultdict(Meter)
        self._t0 = time.perf_counter()

    def update(self, **values):
        for k, v in values.items():
            self.meters[k].update(float(v))

    def log(self, step: int, total_steps: Optional[int] = None):
        parts = [f"step {step}"]
        if total_steps:
            elapsed = time.perf_counter() - self._t0
            rate = elapsed / max(step, 1)
            parts.append(f"eta {rate * (total_steps - step) / 60:.1f}m")
        parts += [f"{k} {m.avg:.4f}" for k, m in self.meters.items()]
        LOG.info("  ".join(parts))


class ShapeLogger:
    """Log novel input-shape combos of a jitted fn (recompile debugging,
    reference perflib/compile.py:53 shape_logging_wrapper)."""

    def __init__(self, fn, name: str = "fn"):
        self.fn = fn
        self.name = name
        self.seen = set()

    def __call__(self, *args, **kwargs):
        shapes = tuple(
            tuple(a.shape) if hasattr(a, "shape") else type(a).__name__
            for a in jax.tree_util.tree_leaves((args, kwargs))
        )
        if shapes not in self.seen:
            self.seen.add(shapes)
            LOG.info("%s: novel input shapes #%d: %s", self.name, len(self.seen), shapes)
        return self.fn(*args, **kwargs)


def device_memory_stats() -> dict:
    """Per-device memory stats (MemMeter equivalent)."""
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        }
    return out


# ---------------------------------------------------------------------------
# Metrics writers: JSONL + dependency-free TensorBoard event files
# (reference logs through train/utils/logger.py TensorBoard/wandb Logger)
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc32c(data: bytes) -> int:
    """Software CRC32-C (Castagnoli), required by the TFRecord framing."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if (c & 1) else (c >> 1)
            table.append(c)
        _CRC_TABLE = table
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _pb_field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _pb_bytes(num: int, payload: bytes) -> bytes:
    return _pb_field(num, 2) + _varint(len(payload)) + payload


class TensorBoardWriter:
    """Minimal TensorBoard scalar writer - hand-encoded Event protos in
    TFRecord framing, zero dependencies. TensorBoard reads the resulting
    events.out.tfevents.* files natively."""

    def __init__(self, logdir: str):
        import os
        import socket

        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._f = open(os.path.join(logdir, fname), "ab")
        # file-version event
        self._write_event(self._event(wall_time=time.time(), file_version=True))

    @staticmethod
    def _event(wall_time, step=None, scalars=None, file_version=False) -> bytes:
        import struct

        ev = _pb_field(1, 1) + struct.pack("<d", wall_time)  # wall_time: double
        if file_version:
            ev += _pb_bytes(3, b"brain.Event:2")
            return ev
        if step is not None:
            ev += _pb_field(2, 0) + _varint(step & 0xFFFFFFFFFFFFFFFF)
        if scalars:
            values = b""
            for tag, val in scalars.items():
                v = _pb_bytes(1, tag.encode()) + _pb_field(2, 5) + struct.pack(
                    "<f", float(val)
                )
                values += _pb_bytes(1, v)  # Summary.value
            ev += _pb_bytes(5, values)  # Event.summary
        return ev

    def _write_event(self, payload: bytes):
        import struct

        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def write_scalars(self, step: int, scalars: dict):
        self._write_event(
            self._event(wall_time=time.time(), step=step, scalars=scalars)
        )

    def close(self):
        self._f.close()


class MetricsWriter:
    """JSONL metrics log + TensorBoard event files under one logdir."""

    def __init__(self, logdir: str, tensorboard: bool = True):
        import os

        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = TensorBoardWriter(logdir) if tensorboard else None

    def write(self, step: int, metrics: dict):
        import json

        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.write_scalars(step, {k: v for k, v in metrics.items()})

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
