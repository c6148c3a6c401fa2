"""Torch-parity ``roi_align`` in JAX.

The reference's geometry encoder pools box-prompt features with
``torchvision.ops.roi_align`` (reference sam3/sam3/model/geometry_encoders.py:665,
default args: spatial_scale=1, sampling_ratio=-1, aligned=False). This
reimplements those semantics from the RoIAlign paper: each output bin
averages ``ratio_h * ratio_w`` bilinear samples, where for adaptive mode
(sampling_ratio <= 0) ``ratio = ceil(roi_size / out_size)`` per ROI.

TPU-first design: all ROIs are processed as one batched gather - no per-ROI
Python loop - so the op jits to a single fused gather/arith program with
static shapes (num_rois is padded by callers). Adaptive sampling keeps
static shapes by sampling a fixed ``max_sampling_ratio`` grid per bin and
weighting each sample by ``(k < ratio) / ratio``; sample *positions* are
computed with the dynamic per-ROI ratio, so the result is bit-comparable to
torchvision as long as ratio <= max_sampling_ratio (for 72x72 features and
roi_size 7, ratio <= ceil(72/7) = 11).
"""

from __future__ import annotations

import jax.numpy as jnp


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    batch_indices: jnp.ndarray,
    output_size: tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    max_sampling_ratio: int = 16,
) -> jnp.ndarray:
    """RoIAlign.

    Args:
      features: (N, C, H, W)
      boxes: (R, 4) xyxy in input-image coordinates
      batch_indices: (R,) int batch index per ROI
      output_size: (out_h, out_w)
      sampling_ratio: samples per bin per axis; <= 0 selects torchvision's
        adaptive mode (per-ROI ceil(bin_size), capped at max_sampling_ratio).
      max_sampling_ratio: static cap for the adaptive sample grid.

    Returns: (R, C, out_h, out_w)
    """
    n, c, h, w = features.shape
    out_h, out_w = output_size
    if boxes.shape[0] == 0:
        return jnp.zeros((0, c, out_h, out_w), features.dtype)
    offset = 0.5 if aligned else 0.0

    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / out_w
    bin_h = roi_h / out_h

    if sampling_ratio > 0:
        s = int(sampling_ratio)
        r_h = jnp.full(boxes.shape[:1], s, jnp.float32)
        r_w = r_h
    else:
        s = int(max_sampling_ratio)
        # torchvision adaptive: ceil(roi_size / out_size) == ceil(bin)
        r_h = jnp.clip(jnp.ceil(bin_h), 1.0, s)
        r_w = jnp.clip(jnp.ceil(bin_w), 1.0, s)

    # Sample coordinates: (R, out*s) per axis; sample k of bin b sits at
    # (b + (k + 0.5) / ratio) * bin. Samples with k >= ratio get weight 0.
    iy = jnp.arange(out_h * s, dtype=jnp.float32)
    ix = jnp.arange(out_w * s, dtype=jnp.float32)
    by, ky = iy // s, iy % s
    bx, kx = ix // s, ix % s
    sy = y1[:, None] + (by[None, :] + (ky[None, :] + 0.5) / r_h[:, None]) * bin_h[:, None]
    sx = x1[:, None] + (bx[None, :] + (kx[None, :] + 0.5) / r_w[:, None]) * bin_w[:, None]
    wy = jnp.where(ky[None, :] < r_h[:, None], 1.0 / r_h[:, None], 0.0)
    wx = jnp.where(kx[None, :] < r_w[:, None], 1.0 / r_w[:, None], 0.0)

    # torchvision: samples with y < -1 or y > H are zero; else coords clamped
    valid_y = (sy >= -1.0) & (sy <= h)
    valid_x = (sx >= -1.0) & (sx <= w)
    syc = jnp.clip(sy, 0.0, h - 1)
    sxc = jnp.clip(sx, 0.0, w - 1)

    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    wy1 = syc - y0
    wx1 = sxc - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    feats = features[batch_indices]  # (R, C, H, W)
    flat = feats.reshape(feats.shape[0], c, h * w)

    def gather2d(yi, xi):
        # yi: (R, HS), xi: (R, WS) -> (R, C, HS, WS)
        idx = yi[:, :, None] * w + xi[:, None, :]  # (R, HS, WS)
        r = idx.shape[0]
        out = jnp.take_along_axis(flat, idx.reshape(r, 1, -1), axis=2)
        return out.reshape(r, c, yi.shape[1], xi.shape[1])

    v00 = gather2d(y0i, x0i)
    v01 = gather2d(y0i, x1i)
    v10 = gather2d(y1i, x0i)
    v11 = gather2d(y1i, x1i)

    wy1b = wy1[:, None, :, None]
    wx1b = wx1[:, None, None, :]
    samples = (
        v00 * (1 - wy1b) * (1 - wx1b)
        + v01 * (1 - wy1b) * wx1b
        + v10 * wy1b * (1 - wx1b)
        + v11 * wy1b * wx1b
    )
    mask = (valid_y[:, None, :, None] & valid_x[:, None, None, :]).astype(samples.dtype)
    weight = (wy[:, None, :, None] * wx[:, None, None, :]).astype(samples.dtype)
    samples = samples * mask * weight

    # Weighted sum of the s x s samples per bin (weights sum to 1 per bin).
    r = samples.shape[0]
    samples = samples.reshape(r, c, out_h, s, out_w, s)
    return samples.sum(axis=(3, 5)).astype(features.dtype)
