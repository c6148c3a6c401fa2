"""Connected components (8-connectivity) on TPU via pointer-jumping.

Replaces the reference's union-find Triton kernel (sam3/sam3/perflib/triton/
connected_components.py) and the optional cc_torch CUDA extension. Pallas on
TPU has no global atomics, so union-find does not translate; instead we use
label propagation with pointer jumping:

  1. init: every foreground pixel's label = its linear index.
  2. iterate: label <- min over the 8-neighborhood (masked to foreground),
     then label <- label[label] (path halving) applied twice, which squares
     propagation distances — convergence in O(log diameter) sweeps.
  3. fixed point detected with lax.while_loop on "any label changed".

Outputs: labels (H, W) int32, 0 for background, root-index+1 for foreground
(stable within a component, not compacted); `component_areas` gives per-label
pixel counts via scatter-add for the reference's small-component filtering
(fill_holes_in_mask_scores, sam3_tracker_utils.py:392).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _neighbor_min(lbl, fg):
    """Min label over the 8-neighborhood + self, restricted to fg."""
    h, w = lbl.shape
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    padded = jnp.pad(lbl, 1, constant_values=big)
    best = lbl
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
            best = jnp.minimum(best, shifted)
    return jnp.where(fg, best, big)


@functools.partial(jax.jit, static_argnums=(1,))
def connected_components(mask, max_iters: int = 64):
    """mask: (H, W) bool -> labels (H, W) int32 (0 = background)."""
    h, w = mask.shape
    fg = mask.astype(bool)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lbl0 = jnp.where(fg, idx, big)

    def jump(lbl):
        flat = lbl.reshape(-1)
        safe = jnp.where(flat == big, 0, flat)
        jumped = jnp.where(flat == big, big, flat[safe])
        return jumped.reshape(h, w)

    def cond(state):
        lbl, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(lbl != prev))

    def body(state):
        lbl, _, it = state
        new = _neighbor_min(lbl, fg)
        new = jump(jump(new))
        return new, lbl, it + 1

    lbl, _, _ = jax.lax.while_loop(
        cond, body, (lbl0, jnp.full_like(lbl0, -1), jnp.int32(0))
    )
    return jnp.where(fg, lbl + 1, 0).astype(jnp.int32)


def component_areas(labels):
    """labels (H, W) int32 (0 = bg) -> areas (H*W + 1,) where areas[l] is the
    pixel count of label l (index 0 collects background)."""
    n = labels.shape[0] * labels.shape[1]
    flat = labels.reshape(-1)
    return jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)


def fill_holes_in_mask_scores(mask_scores, max_hole_area: float,
                              remove_sprinkles: bool = False):
    """Fill small negative-score holes with a small positive score.

    Mirrors reference sam3_tracker_utils.py:392: background components of the
    thresholded mask smaller than `max_hole_area` are set to +0.1 (treated as
    foreground) so tiny holes don't fragment tracked masks. With
    `remove_sprinkles` (reference default at both video call sites,
    sam3_video_base.py:970/:1147), foreground components of the PATCHED mask
    smaller than min(total_fg_area // 2, max_hole_area) are then set to -0.1
    — stray blobs dropped without killing genuinely tiny tracked objects.

    mask_scores: (H, W) float logits. Returns patched scores.
    """
    is_hole_candidate = mask_scores <= 0
    labels = connected_components(is_hole_candidate)
    areas = component_areas(labels)
    pix_area = areas[labels]
    is_hole = (labels > 0) & (pix_area <= max_hole_area)
    patched = jnp.where(is_hole, 0.1, mask_scores)
    if remove_sprinkles:
        fg = patched > 0
        fg_labels = connected_components(fg)
        fg_areas = component_areas(fg_labels)
        thresh = jnp.minimum(fg.sum() // 2, jnp.int32(max_hole_area))
        is_sprinkle = (fg_labels > 0) & (fg_areas[fg_labels] <= thresh)
        patched = jnp.where(is_sprinkle, -0.1, patched)
    return patched


def fill_holes_in_mask_scores_host(mask_scores, max_hole_area: float,
                                   remove_sprinkles: bool = False):
    """Host version of fill_holes_in_mask_scores for the video pipeline's
    emission path (which runs on host numpy anyway).

    The device pointer-jumping version is gather-bound: ~600 ms for
    8x288^2 masks on one v5e (TPU gathers run on the VPU and the
    while_loop can't vectorize across masks). The C++ run-based union-find
    (native/hostkernels.cpp fill_holes_sprinkles, threaded over masks)
    costs <1 ms typical (structured masks, few runs) and single-digit ms
    worst-case (pure noise masks maximize the run count) — bench.py
    reports both. Falls back to scipy.ndimage when the native library
    isn't built.

    With `remove_sprinkles` (the reference's video default), small
    foreground components of the patched mask are set to -0.1; see
    fill_holes_in_mask_scores.

    mask_scores: (..., H, W) float array. Returns patched copy.
    """
    import numpy as np

    out = np.ascontiguousarray(np.array(mask_scores, np.float32, copy=True))
    try:
        from efficientsam3_tpu import native

        if native.lib() is not None:
            native.fill_holes(out, float(max_hole_area), 0.1,
                              remove_sprinkles=remove_sprinkles)
            return out.reshape(mask_scores.shape)
    except Exception:
        pass
    from scipy import ndimage

    flat = out.reshape(-1, *out.shape[-2:])
    eight = np.ones((3, 3), int)
    for sl in flat:
        bg = sl <= 0
        labels, n = ndimage.label(bg, structure=eight)
        if n > 0:
            areas = np.bincount(labels.ravel(), minlength=n + 1)
            areas[0] = 0
            hole = areas[labels] > 0
            hole &= areas[labels] <= max_hole_area
            sl[hole] = 0.1
        if remove_sprinkles:
            fg = sl > 0
            labels, n = ndimage.label(fg, structure=eight)
            if n == 0:
                continue
            thresh = min(int(fg.sum()) // 2, int(max_hole_area))
            areas = np.bincount(labels.ravel(), minlength=n + 1)
            areas[0] = 0
            sprinkle = (areas[labels] > 0) & (areas[labels] <= thresh)
            sl[sprinkle] = -0.1
    return out.reshape(mask_scores.shape)
