"""Mesh construction and sharding strategies.

Replaces the reference's multi-GPU mechanisms (SURVEY §2.10) with JAX
sharding over an ICI mesh:

  P1 (DDP training)          -> batch sharded over 'dp', params replicated;
                                XLA inserts the gradient psum (train/stage1,
                                train/stage3 run under this mesh).
  P2 (frame-parallel video
      detection, NCCL
      all_gather + prefetch)  -> the per-frame detector is batched over a
                                leading 'frames' axis and sharded with
                                frame_parallel(); XLA overlaps the output
                                all-gather with compute on ICI — the
                                reference's hand-rolled async NCCL gather +
                                prefetch (sam3_image.py:701-883) is exactly
                                what the compiler does for a sharded batch.
  P3 (object-parallel
      tracking)               -> tracker object slots shard over 'objects'
                                via object_parallel(); the plan/heuristics
                                stay host-side on gathered small arrays
                                (JAX multi-host runs one program per host,
                                so no Gloo object broadcast is needed).
  P4 (distributed eval)      -> dataset sharding by process index +
                                all_gather of small prediction arrays.
  P5/P6 (process server,
      launchers)             -> jax.distributed.initialize + one process
                                per host; no mp.Queue analog required.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh, e.g. make_mesh({'dp': 2, 'objects': 4})."""
    devices = list(devices if devices is not None else jax.devices())
    total = int(np.prod(list(axis_sizes.values())))
    if total > len(devices):
        raise ValueError(f"need {total} devices, have {len(devices)}")
    arr = np.array(devices[:total]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "dp"):
    return NamedSharding(mesh, P(axis))


def frame_parallel(fn, mesh: Mesh, axis: str = "frames"):
    """Shard a frames-batched function over the mesh.

    fn(variables, frames_batch, *args) with frames_batch leading dim divisible
    by the axis size. Params replicated, frames and outputs sharded — XLA
    schedules the cross-device gather on ICI overlapping compute.
    """
    return jax.jit(
        fn,
        in_shardings=(replicate(mesh), shard_batch(mesh, axis)),
        out_shardings=shard_batch(mesh, axis),
    )


def object_parallel(fn, mesh: Mesh, axis: str = "objects", n_array_args: int = 1):
    """Shard a function whose leading batch dim is object slots.

    The first argument is replicated variables; the next `n_array_args`
    arguments are sharded along their leading (object) dimension; outputs
    shard the same way.
    """
    in_sh = (replicate(mesh),) + (shard_batch(mesh, axis),) * n_array_args
    return jax.jit(fn, in_shardings=in_sh, out_shardings=shard_batch(mesh, axis))
