"""Pallas fused LayerNorm vs torch nn.LayerNorm (interpret mode on CPU)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.common import FusedLayerNorm
from efficientsam3_tpu.ops.pallas.layer_norm import layer_norm

RNG = np.random.default_rng(17)


def test_layer_norm_fwd_bwd_vs_torch():
    b, n, c = 2, 37, 64  # rows not divisible by the block exercises padding
    x = RNG.standard_normal((b, n, c)).astype(np.float32)
    w = RNG.standard_normal(c).astype(np.float32)
    bias = RNG.standard_normal(c).astype(np.float32)
    g = RNG.standard_normal((b, n, c)).astype(np.float32)

    ln = torch.nn.LayerNorm(c, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(w))
        ln.bias.copy_(torch.from_numpy(bias))
    t = torch.from_numpy(x).requires_grad_(True)
    out_t = ln(t)
    out_t.backward(torch.from_numpy(g))

    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))
    np.testing.assert_allclose(
        np.asarray(out), out_t.detach().numpy(), atol=1e-5, rtol=1e-5
    )

    def loss(xx, ww, bb):
        return (layer_norm(xx, ww, bb) * jnp.asarray(g)).sum()

    dx, dw, db = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias)
    )
    np.testing.assert_allclose(np.asarray(dx), t.grad.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw), ln.weight.grad.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(db), ln.bias.grad.numpy(), atol=1e-3, rtol=1e-3
    )


def test_layer_norm_out_dtype():
    x = jnp.asarray(RNG.standard_normal((4, 256)).astype(np.float32))
    w = jnp.ones(256)
    b = jnp.zeros(256)
    out = jax.jit(
        lambda a: layer_norm(a, w, b, 1e-5, jnp.dtype(jnp.bfloat16))
    )(x)
    assert out.dtype == jnp.bfloat16
    full = layer_norm(x, w, b)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(full), atol=2e-2, rtol=2e-2
    )


def test_fused_layer_norm_module_matches_flax():
    from flax import linen as nn

    x = jnp.asarray(RNG.standard_normal((3, 19, 32)).astype(np.float32))
    mod = FusedLayerNorm(epsilon=1e-5)
    ref = nn.LayerNorm(epsilon=1e-5)
    v = mod.init(jax.random.PRNGKey(0), x)
    # identical param tree (names/shapes) -> checkpoint compatible
    rv = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(rv)
    v = jax.tree.map(
        lambda a: jnp.asarray(RNG.standard_normal(a.shape), a.dtype), v
    )
    np.testing.assert_allclose(
        np.asarray(mod.apply(v, x)), np.asarray(ref.apply(v, x)),
        atol=1e-5, rtol=1e-5,
    )
