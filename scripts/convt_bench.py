#!/usr/bin/env python
"""Micro-benchmark: 2x2-stride-2 transposed-conv formulations on TPU.

Shapes = the neck's dconv_0 (72->144, 1024->512). Variants:
  v0 flax-equivalent lax.conv_transpose (bf16)
  v1 einsum + 6D transpose + reshape (ConvTranspose2x as first written)
  v2 einsum emitting bhiwjo + view reshape
  v3 lax.conv_general_dilated with lhs_dilation=2 (manual transposed conv)
  v4 matmul to (N, 4o) + manual dts via two reshape/transpose of halves
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import two_point_step_time

B, H, CI, CO = 1, 72, 1024, 512


def rngx(seed):
    return jax.random.uniform(
        jax.random.fold_in(jax.random.PRNGKey(3), seed), (B, H, H, CI),
        jnp.bfloat16,
    )


def main():
    rng = jax.random.PRNGKey(0)
    w = (jax.random.normal(rng, (2, 2, CI, CO), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )
    bias = jnp.zeros((CO,), jnp.bfloat16) + 0.1

    def v0(seed, w, bias):
        x = rngx(seed)
        y = jax.lax.conv_transpose(
            x, w, strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum((y + bias).astype(jnp.float32))

    def v1(seed, w, bias):
        x = rngx(seed)
        y = jnp.einsum("bhwc,ijco->bhwijo", x, w[::-1, ::-1])
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * H, CO)
        return jnp.sum((y + bias).astype(jnp.float32))

    def v2(seed, w, bias):
        x = rngx(seed)
        y = jnp.einsum("bhwc,ijco->bhiwjo", x, w[::-1, ::-1]) + bias
        y = y.reshape(B, 2 * H, 2 * H, CO)
        return jnp.sum(y.astype(jnp.float32))

    def v3(seed, w, bias):
        x = rngx(seed)
        y = jax.lax.conv_general_dilated(
            x, w[::-1, ::-1], window_strides=(1, 1),
            padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum((y + bias).astype(jnp.float32))

    def v4(seed, w, bias):
        x = rngx(seed)
        wf = w[::-1, ::-1].reshape(4, CI, CO)
        # 4 taps as one matmul each; rows (i) interleave via concat+reshape
        ys = [x @ wf[t] + bias for t in range(4)]  # each (B, H, W, CO)
        top = jnp.concatenate([ys[0][..., None, :], ys[1][..., None, :]], -2)
        bot = jnp.concatenate([ys[2][..., None, :], ys[3][..., None, :]], -2)
        rows = jnp.concatenate(
            [top.reshape(B, H, 1, 2 * H, CO), bot.reshape(B, H, 1, 2 * H, CO)],
            axis=2,
        )
        y = rows.reshape(B, 2 * H, 2 * H, CO)
        return jnp.sum(y.astype(jnp.float32))

    ref = None
    for name, fn in [("v0_lax_convT", v0), ("v1_einsum_T", v1),
                     ("v2_einsum_view", v2), ("v3_lhs_dilated", v3),
                     ("v4_4matmul_concat", v4)]:
        try:
            got = jax.jit(lambda s, a, b, f=fn: f(s, a, b))(0, w, bias)
            got = float(got)
            if ref is None:
                ref = got
            ok = abs(got - ref) / max(abs(ref), 1) < 1e-2
            sec = two_point_step_time(
                jax, jnp, lambda s, a, b, f=fn: f(s, a, b), 32, (w, bias)
            )
            print(f"{name}: {sec * 1e3:.3f} ms  (sum {got:.1f} parity={ok})")
        except Exception as e:  # noqa
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}")


if __name__ == "__main__":
    main()
