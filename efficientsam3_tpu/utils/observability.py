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
