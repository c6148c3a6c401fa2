"""Torch-parity image resize as dense matmuls (MXU-friendly).

The reference relies on ``torch.nn.functional.interpolate`` semantics
throughout (e.g. student head upsample to 72x72 in the builder's
ImageStudentEncoder, mask postprocessing in the image processor, pixel
decoder upsampling in the segmentation head; see reference
sam3/sam3/model/data_misc.py:18 `interpolate`). Checkpoint-parity therefore
requires matching torch's coordinate conventions bit-for-bit-ish.

TPU-first design: separable resize is expressed as two dense matmuls
``y = W_h @ x @ W_w^T`` with precomputed (out,in) weight matrices. For the
shapes this model uses (72->288, 1008-scale masks) this rides the MXU and
fuses with surrounding elementwise work under XLA, instead of the
gather-heavy formulation a direct port would produce. Weight matrices are
built with jnp ops so they constant-fold under jit for static sizes.

Conventions implemented (matching torch):
  - bilinear / bicubic, ``align_corners`` True/False
  - ``align_corners=False`` uses half-pixel centers with the negative-side
    clamp torch applies (src = max(0, (i+0.5)*in/out - 0.5))
  - bicubic uses the Keys kernel with a = -0.75 (torch's choice)
  - no antialiasing (torch default)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """Float source coordinate for each output index (torch convention)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1)
        return i * scale
    scale = in_size / out_size
    src = (i + 0.5) * scale - 0.5
    # torch's area_pixel_compute_source_index clamps the negative side only
    return jnp.maximum(src, 0.0)


def _bilinear_matrix(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    src = _source_coords(out_size, in_size, align_corners)
    x0 = jnp.floor(src)
    w1 = src - x0
    w0 = 1.0 - w1
    i0 = jnp.clip(x0.astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    m0 = (cols[None, :] == i0[:, None]).astype(jnp.float32) * w0[:, None]
    m1 = (cols[None, :] == i1[:, None]).astype(jnp.float32) * w1[:, None]
    return m0 + m1


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel (torch uses a = -0.75)."""
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    w_inner = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w_outer = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at <= 1.0, w_inner, jnp.where(at < 2.0, w_outer, 0.0))


def _bicubic_matrix(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = i * ((in_size - 1) / (out_size - 1))
    else:
        # bicubic does NOT clamp the negative side in torch (cubic=True path)
        src = (i + 0.5) * (in_size / out_size) - 0.5
    x0 = jnp.floor(src)
    frac = src - x0
    cols = jnp.arange(in_size, dtype=jnp.int32)
    mat = jnp.zeros((out_size, in_size), jnp.float32)
    for tap in range(-1, 3):
        idx = jnp.clip(x0.astype(jnp.int32) + tap, 0, in_size - 1)
        w = _cubic_kernel(jnp.float32(tap) - frac)
        mat = mat + (cols[None, :] == idx[:, None]).astype(jnp.float32) * w[:, None]
    return mat


def _separable_resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool,
    matrix_fn,
) -> jnp.ndarray:
    """Apply (out,in) matrices along the last two axes of an NCHW array."""
    out_h, out_w = size
    in_h, in_w = x.shape[-2], x.shape[-1]
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        wh = matrix_fn(out_h, in_h, align_corners)
        xf = jnp.einsum("oh,...hw->...ow", wh, xf, precision=jax.lax.Precision.HIGHEST)
    if in_w != out_w:
        ww = matrix_fn(out_w, in_w, align_corners)
        xf = jnp.einsum("ow,...hw->...ho", ww, xf, precision=jax.lax.Precision.HIGHEST)
    return xf.astype(orig_dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(x, size: tuple[int, int], align_corners: bool = False):
    """Bilinear resize over the trailing (H, W) axes, torch semantics."""
    return _separable_resize(x, size, align_corners, _bilinear_matrix)


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bicubic(x, size: tuple[int, int], align_corners: bool = False):
    """Bicubic resize over the trailing (H, W) axes, torch semantics."""
    return _separable_resize(x, size, align_corners, _bicubic_matrix)


def resize_nearest(x, size: tuple[int, int]):
    """Nearest-neighbor resize (torch 'nearest': src = floor(i * in/out))."""
    out_h, out_w = size
    in_h, in_w = x.shape[-2], x.shape[-1]
    ih = jnp.minimum((jnp.arange(out_h) * in_h // out_h), in_h - 1)
    iw = jnp.minimum((jnp.arange(out_w) * in_w // out_w), in_w - 1)
    return x[..., ih, :][..., iw]


def resize(x, size: tuple[int, int], mode: str = "bilinear", align_corners: bool = False):
    if mode == "bilinear":
        return resize_bilinear(x, size, align_corners)
    if mode == "bicubic":
        return resize_bicubic(x, size, align_corners)
    if mode == "nearest":
        return resize_nearest(x, size)
    raise ValueError(f"unsupported resize mode: {mode}")
