"""Fused depthwise 2D convolution (NHWC) as a Pallas TPU kernel.

The tracker memory encoder's ConvNeXt fuser blocks run a depthwise 7x7
over (8, 72, 72, 256) feature maps (models/memory_encoder.CXBlock,
reference sam3/sam3/model/memory.py:82). XLA lowers that depthwise conv as
49 shifted reads of the full map from HBM — measured 1.25 ms/block at the
tracker shape, which is exactly 49 x 21 MB / HBM bandwidth. This kernel
loads each (H, W, C) map into VMEM once and does the 49 shifted FMAs
locally: one HBM pass in, one out (~0.05 ms) plus the VPU MAC time.

Semantics match flax nn.Conv(features=C, kernel_size=(k, k), padding=k//2,
feature_group_count=C) with bf16 inputs: f32 accumulation, bias add, cast
back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, w_ref, b_ref, o_ref, *, k: int):
    h, w, c = x_ref.shape[1:]
    p = k // 2
    # pad AND upcast once: converting per tap costs k*k full-map converts
    # on the VPU (measured ~2x the whole kernel at 7x7); the f32 padded
    # copy fits VMEM at the 128-lane channel blocking ((78, 78, 128) f32
    # = 3.1 MB)
    xp = jnp.pad(x_ref[0].astype(jnp.float32), ((p, p), (p, p), (0, 0)))
    acc = jnp.zeros((h, w, c), jnp.float32)
    # W is the SUBLANE axis of the (h, w, c) block: a w-offset slice costs
    # a sublane realignment of the whole map, so hoist it out of the di
    # loop — k shifted views (materialized once each) instead of k*k
    for dj in range(k):
        xj = xp[:, dj:dj + w, :]  # (h + 2p, w, c): one sublane shift
        for di in range(k):
            acc = acc + w_ref[di, dj] * xj[di:di + h]  # h-slices are free
    o_ref[0] = (acc + b_ref[0]).astype(o_ref.dtype)


def _dw_call(x, kernel, bias, interpret):
    b, h, w, c = x.shape
    k = kernel.shape[0]
    assert kernel.shape[:2] == (k, k) and kernel.shape[2] == 1
    wk = kernel[:, :, 0, :].astype(jnp.float32)  # (k, k, C)
    # channels are independent in a depthwise conv: block them in 128-lane
    # groups so each program's padded copy + f32 accumulator fit VMEM
    cb = 128 if c % 128 == 0 and c > 128 else c
    return pl.pallas_call(
        functools.partial(_dw_kernel, k=k),
        grid=(b, c // cb),
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((k, k, cb), lambda i, j: (0, 0, j)),
            # bias as (1, C): 1-D blocks of a 1-D operand hit an XLA-vs-
            # Mosaic tiling mismatch (T(256) vs T(128)) on real TPU
            pl.BlockSpec((1, cb), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, wk, bias.astype(jnp.float32).reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def depthwise_conv2d(x, kernel, bias, interpret=False):
    """x (B, H, W, C); kernel (k, k, 1, C) flax depthwise layout; bias (C,).

    Same-padding depthwise conv; whole (H, W, C) maps are blocked into VMEM
    (fine for the tracker's 72x72x256 = 2.7 MB bf16 maps). Differentiable:
    dx is the same kernel spatially flipped; dw/db are jnp reductions
    (training-path only — the fuser is frozen in every training stage)."""
    return _dw_call(x, kernel, bias, interpret)


def _dw_fwd(x, kernel, bias, interpret):
    return _dw_call(x, kernel, bias, interpret), (x, kernel)


def _dw_bwd(interpret, res, g):
    x, kernel = res
    k = kernel.shape[0]
    p = k // 2
    flipped = kernel[::-1, ::-1]
    dx = _dw_call(g, flipped, jnp.zeros(kernel.shape[-1], jnp.float32),
                  interpret).astype(x.dtype)
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0))
    )
    h, w = x.shape[1], x.shape[2]
    gf = g.astype(jnp.float32)
    dw = jnp.stack([
        jnp.stack([
            jnp.sum(xp[:, di:di + h, dj:dj + w, :] * gf, axis=(0, 1, 2))
            for dj in range(k)
        ])
        for di in range(k)
    ])[:, :, None, :].astype(kernel.dtype)  # (k, k, 1, C)
    db = jnp.sum(gf, axis=(0, 1, 2)).astype(kernel.dtype)
    return dx, dw, db


depthwise_conv2d.defvjp(_dw_fwd, _dw_bwd)


def use_pallas_depthwise(x) -> bool:
    """Dispatch rule: TPU backend, lane-aligned channels, VMEM-sized maps."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    b, h, w, c = x.shape
    return c % 128 == 0 and h * w * c * x.dtype.itemsize <= 6 * 1024 * 1024
