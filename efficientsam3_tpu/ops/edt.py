"""Exact Euclidean distance transform, TPU-first.

Replaces the reference's Triton Felzenszwalb kernel (sam3/sam3/model/
edt.py:54-172; scipy fallback sam3_tracker_utils.py:14): distance from each
nonzero pixel to the nearest zero pixel (scipy.ndimage.distance_transform_edt
semantics). Used for sampling correction clicks far from mask errors.

TPU formulation (no sequential parabola envelopes, no atomics):
  1. Row pass: 1D distance-in-steps to the nearest zero within each row via
    two associative scans (forward/backward) -> exact 1D distances.
  2. Column pass: D^2[i, c] = min_r ((i - r)^2 + rowdist[r, c]^2), evaluated
    as a chunked min-plus reduction over r (vectorized VPU min-reductions,
    O(H^2 W) with H-chunked memory traffic).

Both passes are jittable with static shapes; batch leading dims vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


def _row_distance(mask):
    """mask: (H, W) bool (True = foreground). Returns per-row step distance
    to the nearest background pixel in that row (BIG if none)."""
    h, w = mask.shape
    fg = mask.astype(jnp.float32)

    def fwd(carry, col):
        d = jnp.where(col > 0, carry + 1.0, 0.0)
        d = jnp.minimum(d, _BIG)
        return d, d

    init = jnp.full((h,), _BIG)
    _, fwd_d = jax.lax.scan(fwd, init, fg.T)
    _, bwd_d = jax.lax.scan(fwd, init, fg.T[::-1])
    d = jnp.minimum(fwd_d, bwd_d[::-1]).T  # (H, W)
    return d


@functools.partial(jax.jit, static_argnums=(1,))
def edt(mask, chunk: int = 128):
    """mask: (H, W) bool/int -> (H, W) float32 Euclidean distances."""
    mask = mask.astype(bool)
    h, w = mask.shape
    g = _row_distance(mask)  # steps within row, BIG where row all-fg
    g2 = jnp.minimum(g * g, _BIG)  # squared row distances

    rows = jnp.arange(h, dtype=jnp.float32)
    n_chunks = -(-h // chunk)
    pad = n_chunks * chunk - h
    g2p = jnp.pad(g2, ((0, pad), (0, 0)), constant_values=_BIG)
    rp = jnp.pad(rows, (0, pad), constant_values=-1e6)

    def body(ci, best):
        r = jax.lax.dynamic_slice(rp, (ci * chunk,), (chunk,))  # (chunk,)
        gr = jax.lax.dynamic_slice(g2p, (ci * chunk, 0), (chunk, w))  # (chunk, W)
        # (H, chunk) squared row offsets + (chunk, W) row costs -> (H, W)
        diff = rows[:, None] - r[None, :]
        cand = diff[:, :, None] * diff[:, :, None] + gr[None, :, :]
        return jnp.minimum(best, cand.min(axis=1))

    best = jax.lax.fori_loop(0, n_chunks, body, jnp.full((h, w), _BIG))
    d = jnp.sqrt(jnp.minimum(best, _BIG))
    return jnp.where(mask, d, 0.0).astype(jnp.float32)


def edt_batch(masks, chunk: int = 128):
    """(B, H, W) -> (B, H, W)."""
    return jax.vmap(lambda m: edt(m, chunk))(masks)
