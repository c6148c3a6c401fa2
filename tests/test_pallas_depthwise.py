"""Pallas depthwise conv parity (interpret mode on CPU) vs lax conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.pallas.depthwise import depthwise_conv2d

RNG = np.random.default_rng(0)


def _lax_depthwise(x, kernel, bias):
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel.astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return y + bias


@pytest.mark.parametrize("b,h,w,c,k", [(2, 8, 8, 128, 7), (1, 9, 11, 256, 3)])
def test_depthwise_matches_lax(b, h, w, c, k):
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    kern = jnp.asarray(RNG.standard_normal((k, k, 1, c)), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((c,)), jnp.float32)
    want = _lax_depthwise(x, kern, bias)
    got = depthwise_conv2d(x, kern, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_depthwise_grads_match_lax():
    b, h, w, c, k = 1, 6, 6, 128, 3
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    kern = jnp.asarray(RNG.standard_normal((k, k, 1, c)), jnp.float32)
    bias = jnp.asarray(RNG.standard_normal((c,)), jnp.float32)

    def f_ref(x_, k_, b_):
        return jnp.sum(jnp.sin(_lax_depthwise(x_, k_, b_)))

    def f_mine(x_, k_, b_):
        return jnp.sum(jnp.sin(depthwise_conv2d(x_, k_, b_, True)))

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, kern, bias)
    gm = jax.grad(f_mine, argnums=(0, 1, 2))(x, kern, bias)
    for a, b_ in zip(gr, gm):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-3, rtol=1e-3)
