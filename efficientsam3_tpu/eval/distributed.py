"""Distributed evaluation helpers (reference P4, SURVEY §2.10).

The reference shards eval datasets with torchrun and all_gathers prediction
payloads over NCCL with CPU/filesystem fallbacks
(train/utils/distributed.py:57-186). Under JAX multi-host there is one
process per host: shard by process index, gather small arrays through a
replicated device computation, and (for large prediction payloads) through
the same filesystem rendezvous trick.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Optional, Sequence

import numpy as np

import jax


def shard_for_process(items: Sequence, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> list:
    """Round-robin shard of eval items for this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]


def all_gather_array(x: np.ndarray, mesh=None) -> np.ndarray:
    """Gather a small per-process array across hosts (device collective)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def all_gather_via_filesys(obj, rendezvous_dir: str, tag: str = "preds",
                           timeout_s: float = 600.0,
                           process_index: Optional[int] = None,
                           process_count: Optional[int] = None) -> list:
    """Filesystem gather for huge eval payloads (reference
    train/utils/distributed.py:57 all_gather_via_filesys)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    os.makedirs(rendezvous_dir, exist_ok=True)
    mine = os.path.join(rendezvous_dir, f"{tag}_{pi}.pkl")
    tmp = mine + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, mine)
    out = []
    deadline = time.time() + timeout_s
    for r in range(pc):
        path = os.path.join(rendezvous_dir, f"{tag}_{r}.pkl")
        while not os.path.exists(path):
            if time.time() > deadline:
                raise TimeoutError(f"rank {r} payload missing: {path}")
            time.sleep(0.5)
        with open(path, "rb") as f:
            out.append(pickle.load(f))
    return out


def write_coco_predictions(path: str, predictions: list):
    """COCO-format prediction file writer (reference eval/coco_writer.py)."""
    with open(path, "w") as f:
        json.dump(predictions, f)
