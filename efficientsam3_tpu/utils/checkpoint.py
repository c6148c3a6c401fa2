"""Checkpoint save/load: orbax for native checkpoints, converters for
reference torch weights, partial checkpoints and auto-resume.

Covers the reference's checkpoint subsystem (SURVEY §5.4):
  - save/load with step numbering and auto-resume of the latest step
    (stage1 auto_resume_helper, trainer.py:337-398);
  - partial checkpoints via param-prefix filters (skip_saving_parameters);
  - torch `sam3.pt` / EfficientSAM3 `.pt` conversion: key cleanup
    (model_builder.py:596-622 strips `detector.` / `student_trunk.`,
    remaps `tracker.`) + per-subtree converters from utils/torch_convert
    and utils/convert_backbones.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state, param_prefixes=None):
    """state: pytree. param_prefixes: only save matching top-level keys of
    state['params'] (partial checkpoints)."""
    if param_prefixes is not None and "params" in state:
        params = {
            k: v for k, v in state["params"].items()
            if any(k.startswith(p) for p in param_prefixes)
        }
        state = dict(state, params=params)
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.StandardCheckpointer() as ck:
        ck.save(path, state, force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Auto-resume helper: the highest saved step (stage1 auto_resume)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"step_(\d+)", d))
    ]
    return max(steps) if steps else None


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None, target=None):
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return None, None
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.StandardCheckpointer() as ck:
        state = ck.restore(path, target) if target is not None else ck.restore(path)
    return state, step


def merge_params(base: dict, update: dict) -> dict:
    """Recursively splice `update` into `base` (checkpoint merge tooling:
    stage1 convert_*_weights, stage3 merge_stage3_checkpoint_for_eval)."""
    out = dict(base)
    for k, v in update.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out


def assert_frozen_unchanged(before: dict, after: dict, frozen_prefixes):
    """Freeze audit (reference checkpoint_utils.assert_skipped_parameters_
    are_frozen): frozen subtrees must be bit-identical after training."""
    flat_b = jax.tree_util.tree_leaves_with_path(before)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(after))
    for path, leaf in flat_b:
        key = jax.tree_util.keystr(path)
        if any(key.startswith(f"['{p}'") for p in frozen_prefixes):
            other = flat_a.get(path)
            if other is None or not np.array_equal(np.asarray(leaf), np.asarray(other)):
                raise AssertionError(f"frozen param changed: {key}")


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def clean_reference_state_dict(sd: dict) -> dict:
    """Key cleanup per reference model_builder.py:596-622."""
    out = {}
    for k, v in sd.items():
        nk = k
        if nk.startswith("detector."):
            nk = nk[len("detector.") :]
        nk = nk.replace("student_trunk.", "")
        out[nk] = v
    return out


def load_torch_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return clean_reference_state_dict(
        {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}
    )
