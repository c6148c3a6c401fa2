"""Fused 2D RMSNorm as a Pallas TPU kernel (fwd + bwd).

TPU-native equivalent of the reference's fused Triton kernel
(sam3/sam3/backbones/efficientvit/nn/triton_rms_norm.py:1-191): normalize
over the channel axis of an NHWC feature map, with affine weight+bias, in
ONE pass over HBM for the forward and one for the backward (the Triton
version exists because eager torch materializes every intermediate; under
XLA the main win is guaranteed fusion + explicit VMEM blocking for the
backward's recompute-free formulation).

Layout: x is (N, H, W, C) NHWC; the kernel flattens to (rows, C) and tiles
rows into VMEM blocks; the channel axis stays the 128-lane minor dimension,
so the per-row reduction vectorizes on the VPU.

Falls back to a pure-jnp implementation under `interpret=True` environments
automatically (pallas interpret mode is used on CPU in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROW_BLOCK = 256


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, rstd_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(ms + eps)
    o_ref[:] = (x * rstd * w_ref[:] + b_ref[:]).astype(o_ref.dtype)
    rstd_ref[:] = rstd[:, 0]


def _bwd_kernel(x_ref, w_ref, rstd_ref, g_ref, dx_ref, dwp_ref, dbp_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    rstd = rstd_ref[:][:, None]
    xhat = x * rstd
    wg = g * w
    # d xhat/dx contribution: rstd * (wg - xhat * mean(wg * xhat))
    c = jnp.mean(wg * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (wg - xhat * c)).astype(dx_ref.dtype)
    dwp_ref[:] = jnp.sum(g * xhat, axis=0, keepdims=True)
    dbp_ref[:] = jnp.sum(g, axis=0, keepdims=True)


def _rows_grid(rows: int):
    return pl.cdiv(rows, ROW_BLOCK)


def _fwd_call(x2, w, b, eps, interpret):
    rows, c = x2.shape
    grid = (_rows_grid(rows),)
    out, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=(
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((ROW_BLOCK,), lambda i: (i,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), x2.dtype),
            jax.ShapeDtypeStruct((rows,), jnp.float32),
        ),
        interpret=interpret,
    )(x2, w, b)
    return out, rstd


def _bwd_call(x2, w, rstd, g2, eps, interpret):
    rows, c = x2.shape
    nblocks = _rows_grid(rows)
    dx, dw_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((ROW_BLOCK,), lambda i: (i,)),
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), x2.dtype),
            jax.ShapeDtypeStruct((nblocks, c), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, c), jnp.float32),
        ),
        interpret=interpret,
    )(x2, w, rstd, g2)
    return dx, dw_p.sum(0), db_p.sum(0)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rms_norm_2d(x, weight, bias, eps: float = 1e-5):
    """x: (N, H, W, C) NHWC -> same, RMS-normalized over C with affine."""
    out, _ = _fwd_impl(x, weight, bias, eps)
    return out


def _fwd_impl(x, weight, bias, eps):
    n, h, w_, c = x.shape
    rows = n * h * w_
    pad = (-rows) % ROW_BLOCK
    x2 = x.reshape(rows, c)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out2, rstd = _fwd_call(x2, weight, bias, eps, _use_interpret())
    return out2[:rows].reshape(x.shape), (rstd, pad)


def _vjp_fwd(x, weight, bias, eps):
    out, (rstd, pad) = _fwd_impl(x, weight, bias, eps)
    return out, (x, weight, rstd, pad)


def _vjp_bwd(eps, res, g):
    x, weight, rstd, pad = res
    n, h, w_, c = x.shape
    rows = n * h * w_
    x2 = x.reshape(rows, c)
    g2 = g.reshape(rows, c)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    dx2, dw, db = _bwd_call(x2, weight, rstd, g2, eps, _use_interpret())
    return dx2[:rows].reshape(x.shape), dw.astype(weight.dtype), db.astype(weight.dtype)


rms_norm_2d.defvjp(_vjp_fwd, _vjp_bwd)
