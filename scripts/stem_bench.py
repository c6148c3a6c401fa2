#!/usr/bin/env python
"""Micro-benchmark of EfficientViT stem variants on the real TPU.

The grounding profile attributes ~1.9 ms of the 15.6 ms step to the stem
region: a 3-channel 1008^2 stride-2 conv XLA lays out pathologically
(0.62 ms conv + 0.40 ms input layout copy) plus hardswish/BN elementwise
at C=16 minor — only 16 of 128 lanes live (0.57 ms of selects). This
script times candidate reformulations; the winner lands in
models/efficientvit.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import two_point_step_time

C_OUT = 16
H = 1008


def rngx(seed, shape):
    return jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(3), seed), shape)


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def main():
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (3, 3, 3, C_OUT), jnp.float32) * 0.1
    scale = jnp.ones((C_OUT,)) * 1.1
    bias = jnp.zeros((C_OUT,)) + 0.1

    # v0: current formulation — nn.Conv-equivalent lax conv NHWC + BN + hswish
    def v0(seed, w, scale, bias):
        x = rngx(seed, (1, H, H, 3))
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * scale + bias
        y = hardswish(y)
        return jnp.sum(y.astype(jnp.float32))

    # v1: im2col (s2d slices) + dot, NHWC out
    def im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, dy:dy + H:2, dx:dx + H:2, :]
            for dy in range(3) for dx in range(3)
        ]
        return jnp.concatenate(cols, axis=-1)  # (1, 504, 504, 27)

    def v1(seed, w, scale, bias):
        x = rngx(seed, (1, H, H, 3))
        p = im2col(x.astype(jnp.bfloat16))
        wf = w.transpose(0, 1, 2, 3).reshape(27, C_OUT).astype(jnp.bfloat16)
        y = p @ wf
        y = y * scale + bias
        y = hardswish(y)
        return jnp.sum(y.astype(jnp.float32))

    # v2: im2col + TRANSPOSED dot -> (C, N) so elementwise fills lanes,
    # then transpose back to NHWC
    def v2(seed, w, scale, bias):
        x = rngx(seed, (1, H, H, 3))
        p = im2col(x.astype(jnp.bfloat16)).reshape(-1, 27)  # (N, 27)
        wf = w.reshape(27, C_OUT).astype(jnp.bfloat16)
        yt = wf.T @ p.T  # (C, N)
        yt = yt * scale[:, None] + bias[:, None]
        yt = hardswish(yt)
        y = yt.T.reshape(1, H // 2, H // 2, C_OUT)
        return jnp.sum(y.astype(jnp.float32))

    # v3: NCHW conv
    def v3(seed, w, scale, bias):
        x = rngx(seed, (1, H, H, 3)).transpose(0, 3, 1, 2)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
        y = y * scale[:, None, None] + bias[:, None, None]
        y = hardswish(y)
        return jnp.sum(y.astype(jnp.float32))

    # v4: im2col + dot, keep NHWC, but fp32 input converted once
    def v4(seed, w, scale, bias):
        x = rngx(seed, (1, H, H, 3)).astype(jnp.bfloat16)
        p = im2col(x)
        wf = w.reshape(27, C_OUT).astype(jnp.bfloat16)
        y = jnp.einsum("bhwk,kc->bhwc", p, wf)
        y = hardswish(y * scale + bias)
        # feed a fake depthwise consumer to see post-layout cost
        return jnp.sum(y.astype(jnp.float32))

    # v5: space-to-depth via reshape+transpose (NO strided slices), then the
    # 3x3 s2 conv == 2x2 conv over 12 planes == 4 unit-shifted plane stacks
    # contracted on the MXU; elementwise in (C, HW) layout (all lanes live);
    # one transpose back to NHWC at the end.
    def w_to_w2(w):
        # W2[(qy,qx),(py,px,c),o]: tap (dy,dx) -> qy=(dy-1)//2? mapping:
        # dy=0 -> (q=0, p=1); dy=1 -> (q=1, p=0); dy=2 -> (q=1, p=1)
        w2 = jnp.zeros((2, 2, 2, 2, 3, C_OUT), w.dtype)
        qp = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
        for dy in range(3):
            qy, py = qp[dy]
            for dx in range(3):
                qx, px = qp[dx]
                w2 = w2.at[qy, qx, py, px].set(w[dy, dx])
        return w2.reshape(2, 2, 12, C_OUT)

    w2 = w_to_w2(w)

    def v5(seed, w2, scale, bias):
        x = rngx(seed, (1, H, H, 3)).astype(jnp.bfloat16)
        hh = H // 2
        p = x.reshape(hh, 2, hh, 2, 3).transpose(1, 3, 4, 0, 2).reshape(
            12, hh, hh
        )
        pp = jnp.pad(p, ((0, 0), (1, 0), (1, 0)))
        p4 = jnp.stack(
            [pp[:, qy:qy + hh, qx:qx + hh] for qy in range(2) for qx in range(2)]
        )  # (4, 12, hh, hh)
        y = jnp.einsum(
            "qthw,qto->ohw", p4, w2.reshape(4, 12, C_OUT).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        y = hardswish(y * scale[:, None, None] + bias[:, None, None])
        y = y.astype(jnp.bfloat16).transpose(1, 2, 0)[None]
        return jnp.sum(y.astype(jnp.float32))

    # v6: like v5 but elementwise in NHWC after transposing first
    def v6(seed, w2, scale, bias):
        x = rngx(seed, (1, H, H, 3)).astype(jnp.bfloat16)
        hh = H // 2
        p = x.reshape(hh, 2, hh, 2, 3).transpose(0, 2, 1, 3, 4).reshape(
            hh, hh, 12
        )
        pp = jnp.pad(p, ((1, 0), (1, 0), (0, 0)))
        p4 = jnp.concatenate(
            [pp[qy:qy + hh, qx:qx + hh] for qy in range(2) for qx in range(2)],
            axis=-1,
        )  # (hh, hh, 48)
        y = jnp.einsum(
            "hwt,to->hwo", p4, w2.reshape(48, C_OUT).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        y = hardswish(y * scale + bias).astype(jnp.bfloat16)[None]
        return jnp.sum(y.astype(jnp.float32))

    for name, fn in [("v0_conv_nhwc", v0), ("v3_conv_nchw", v3),
                     ("v5_s2d_chw", lambda s, a, b, c: v5(s, w2, b, c)),
                     ("v6_s2d_nhwc", lambda s, a, b, c: v6(s, w2, b, c))]:
        try:
            got = float(jax.jit(lambda s, a, b, c, f=fn: f(s, a, b, c))(
                0, w, scale, bias))
            sec = two_point_step_time(
                jax, jnp, lambda s, a, b, c, f=fn: f(s, a, b, c), 32,
                (w, scale, bias),
            )
            print(f"{name}: {sec * 1e3:.3f} ms  (sum {got:.1f})")
        except Exception as e:  # noqa
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    main()
