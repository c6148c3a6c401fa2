"""Fused LayerNorm as a Pallas TPU kernel (fwd + bwd).

Why: the grounding step runs 18 LayerNorms over the 5216-token fusion
stream (reference encoder.py:13 pre-norm layers) and the tracker runs ~13
more over the (8, 5184, 256) object stream. Under XLA each nn.LayerNorm
lowers to a convert+reduce fusion plus a separate normalize fusion —
three-plus HBM passes over an f32 stream (~0.10 ms each measured on v5e;
1.85 ms of the 15.6 ms step). This kernel does ONE read and ONE write per
row block with fp32 statistics in VMEM, and can emit bf16 directly so the
consumer Dense layers skip their convert pass (numerically identical: they
cast to bf16 anyway).

The forward emits ONLY the normalized output — no per-row stats residuals.
1-D (rows,) outputs trip Mosaic/XLA tiling disagreements (T(256) vs
T(1024)) and cost an extra HBM write; the backward kernel recomputes
mean/rstd from x instead, which is free bandwidth-wise because it must
stream x for xhat anyway.

Semantics match flax nn.LayerNorm / torch nn.LayerNorm over the last axis:
y = (x - mean) / sqrt(var + eps) * scale + bias, biased variance.

Falls back to pallas interpret mode off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROW_BLOCK = 256


def _stats(x, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean, rstd = _stats(x, eps)
    o_ref[:] = ((x - mean) * rstd * w_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dwp_ref, dbp_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    mean, rstd = _stats(x, eps)
    xhat = (x - mean) * rstd
    wg = g * w
    # dx = rstd * (wg - mean(wg) - xhat * mean(wg * xhat))
    c1 = jnp.mean(wg, axis=-1, keepdims=True)
    c2 = jnp.mean(wg * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (wg - c1 - xhat * c2)).astype(dx_ref.dtype)
    dwp_ref[:] = jnp.sum(g * xhat, axis=0, keepdims=True)
    dbp_ref[:] = jnp.sum(g, axis=0, keepdims=True)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(x2, w, b, eps, out_dtype, interpret):
    rows, c = x2.shape
    grid = (pl.cdiv(rows, ROW_BLOCK),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        interpret=interpret,
    )(x2, w, b)


def _bwd_call(x2, w, g2, eps, interpret):
    rows, c = x2.shape
    nblocks = pl.cdiv(rows, ROW_BLOCK)
    dx, dw_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
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
    )(x2, w, g2)
    return dx, dw_p.sum(0), db_p.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, weight, bias, eps: float = 1e-5, out_dtype=None):
    """LayerNorm over the last axis of x (any leading rank).

    out_dtype: output dtype (default: x.dtype). Statistics are fp32.
    """
    c = x.shape[-1]
    rows = x.size // c
    pad = (-rows) % ROW_BLOCK
    x2 = x.reshape(rows, c)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    od = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    out2 = _fwd_call(
        x2, weight.astype(jnp.float32), bias.astype(jnp.float32), eps, od,
        _use_interpret(),
    )
    return out2[:rows].reshape(*x.shape[:-1], c)


def _vjp_fwd(x, weight, bias, eps, out_dtype):
    return layer_norm(x, weight, bias, eps, out_dtype), (x, weight)


def _vjp_bwd(eps, out_dtype, res, g):
    x, weight = res
    c = x.shape[-1]
    rows = x.size // c
    pad = (-rows) % ROW_BLOCK
    x2 = x.reshape(rows, c)
    g2 = g.reshape(rows, c)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    dx2, dw, db = _bwd_call(
        x2, weight.astype(jnp.float32), g2, eps, _use_interpret()
    )
    return (
        dx2[:rows].reshape(x.shape),
        dw.astype(weight.dtype),
        db.astype(weight.dtype),
    )


layer_norm.defvjp(_vjp_fwd, _vjp_bwd)
