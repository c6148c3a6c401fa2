"""Pallas fused RMSNorm vs reference semantics (interpret mode on CPU)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.pallas.rms_norm import rms_norm_2d

RNG = np.random.default_rng(9)


def _torch_rms_norm_2d(x_nchw, w, b, eps=1e-5):
    """Reference semantics (triton_rms_norm.py fwd): normalize over C."""
    t = torch.from_numpy(x_nchw).requires_grad_(True)
    ms = (t * t).mean(dim=1, keepdim=True)
    out = t * torch.rsqrt(ms + eps)
    out = out * torch.from_numpy(w)[None, :, None, None] + torch.from_numpy(b)[
        None, :, None, None
    ]
    return t, out


def test_rms_norm_2d_fwd_bwd():
    n, h, w_, c = 2, 5, 7, 32
    x = RNG.standard_normal((n, c, h, w_)).astype(np.float32)
    wgt = RNG.standard_normal(c).astype(np.float32)
    b = RNG.standard_normal(c).astype(np.float32)
    g = RNG.standard_normal((n, c, h, w_)).astype(np.float32)

    t, out_t = _torch_rms_norm_2d(x, wgt, b)
    out_t.backward(torch.from_numpy(g))

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    g_nhwc = jnp.asarray(g.transpose(0, 2, 3, 1))

    fn = lambda xx, ww, bb: rms_norm_2d(xx, ww, bb)
    out = fn(x_nhwc, jnp.asarray(wgt), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_t.detach().numpy(),
        atol=1e-5, rtol=1e-5,
    )

    def loss(xx, ww, bb):
        return (fn(xx, ww, bb) * g_nhwc).sum()

    dx, dw, db = jax.grad(loss, argnums=(0, 1, 2))(
        x_nhwc, jnp.asarray(wgt), jnp.asarray(b)
    )
    np.testing.assert_allclose(
        np.asarray(dx).transpose(0, 3, 1, 2), t.grad.numpy(), atol=1e-4, rtol=1e-4
    )
    # weight/bias grads vs autodiff of a plain-jnp formulation
    def plain(xx, ww, bb):
        ms = jnp.mean(xx * xx, axis=-1, keepdims=True)
        return ((xx * jax.lax.rsqrt(ms + 1e-5)) * ww + bb) * g_nhwc

    dw_ref, db_ref = jax.grad(
        lambda ww, bb: plain(x_nhwc, ww, bb).sum(), argnums=(0, 1)
    )(jnp.asarray(wgt), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=1e-3, rtol=1e-3)


def test_rms_norm_2d_jit_and_padding():
    # rows not divisible by the block size exercises the pad path
    x = jnp.asarray(RNG.standard_normal((1, 3, 3, 16)).astype(np.float32))
    w = jnp.ones(16)
    b = jnp.zeros(16)
    out = jax.jit(lambda a: rms_norm_2d(a, w, b))(x)
    ms = np.mean(np.asarray(x) ** 2, axis=-1, keepdims=True)
    want = np.asarray(x) / np.sqrt(ms + 1e-5)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
