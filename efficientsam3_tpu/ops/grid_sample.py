"""Torch-parity ``grid_sample`` (bilinear, 2D) in JAX.

The reference's geometry encoder pools point-prompt features with
``F.grid_sample`` (reference sam3/sam3/model/geometry_encoders.py:616).
This implements the same semantics with gathers; on TPU the gathers are
small (a handful of prompt points against a 72x72 feature map), so a
dense-matmul formulation is unnecessary here.

Supported: mode='bilinear', padding_mode in {'zeros','border'},
align_corners True/False, NCHW input, grid (N, Hg, Wg, 2) in [-1, 1] xy.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample ``x`` (N, C, H, W) at ``grid`` (N, Hg, Wg, 2) -> (N, C, Hg, Wg)."""
    n, c, h, w = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        """Gather x at integer (iy, ix) with out-of-bounds handling."""
        if padding_mode == "border":
            ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
            valid = jnp.ones_like(ix, dtype=x.dtype)
        else:  # zeros
            valid = (
                (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            ).astype(x.dtype)
            ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        # x: (N, C, H, W); take per-batch with advanced indexing via vmap-free
        # flat gather: flat index = iy * w + ix over flattened HW.
        flat = x.reshape(n, c, h * w)
        idx = (iyc * w + ixc).reshape(n, -1)  # (N, Hg*Wg)
        out = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (N, C, Hg*Wg)
        return out.reshape(n, c, *ix.shape[1:]) * valid[:, None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[:, None]
    wy = wy[:, None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)
