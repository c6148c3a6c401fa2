"""Tracker memory encoder: fuse pixel features with the predicted mask.

Mirrors reference sam3/sam3/model/memory.py with the builder config
(model_builder.py:331-364): mask downsampler (antialiased bilinear resize to
1152x1152, then 4 stride-2 conv+LN2d+GELU stages to 72x72, 1x1 to 256ch),
pixel-feature 1x1 projection, 2 ConvNeXt (CXBlock) fuser layers, 1x1
projection to the 64-dim memory space, sine position encoding (64 feats).

NHWC throughout; the antialiased resize uses jax.image (matches torch
antialias=True downsampling closely).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import LayerNorm2d, gelu_exact, sine_pos_embed_2d


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's names/shapes ("kernel", "bias") for a
    conv whose math runs outside the module (the fused stage-0 matmuls)."""

    shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


def _stride2_tap_matrix(out_n: int, in_n: int, delta: int):
    """(out_n, in_n) 0/1 selection P with P[i, 2*i + delta - 1] = 1.

    Out-of-range sources give zero rows — exactly the conv's zero padding.
    Built from jnp primitives so it never appears as a big literal in the
    serialized HLO (this box's remote-compile endpoint rejects those)."""
    src = 2 * jnp.arange(out_n) + delta - 1
    inside = (src >= 0) & (src < in_n)
    return jnp.where(
        inside[:, None],
        jax.nn.one_hot(jnp.clip(src, 0, in_n - 1), in_n, dtype=jnp.float32),
        0.0,
    )


class MaskDownSampler(nn.Module):
    """(B, H, W, 1) mask logits -> (B, H/16, W/16, embed_dim) after an
    optional antialiased resize to interpol_size (memory.py:19).

    TPU note: the resize and the first conv stage (C=1 -> 4) are both
    linear in the mask and the 3x3 kernel decomposes exactly by rows
    (w[di, dj] = sum_di e_di w[di, :]^T), so resize + stage 0 run as ONE
    separable matmul composition: the stride-2 tap-selection matrices fold
    into the bilinear matrices (A_di = P_di @ R_h, B_dj = P_dj @ R_w) and
    the 1152^2 intermediate never exists. The TPU conv emitter idles
    127/128 MXU lanes at C=1 — resize + stage-0 conv measured 3.5 ms for
    8 objects at 1008^2 where this formulation runs in ~0.4 ms. torch
    `F.interpolate(..., antialias=True)` UPSCALING equals plain bilinear
    (the triangle kernel is only widened for scale < 1), so using the
    bilinear matrices is exact. bf16 matmuls with f32 accumulation."""

    embed_dim: int = 256
    stride: int = 2
    kernel_size: int = 3
    padding: int = 1
    num_layers: int = 4  # total stride 16
    interpol_size: Optional[tuple] = (1152, 1152)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.stride == 2 and self.kernel_size == 3 and self.padding == 1
        from efficientsam3_tpu.ops.interpolate import _bilinear_matrix

        b, h0, w0, cin = x.shape
        assert cin == 1, "mask downsampler input is single-channel"
        ih, iw = self.interpol_size or (h0, w0)
        oh, ow = ih // 2, iw // 2
        dt = self.dtype or jnp.float32

        # ---- stage 0 (+ optional resize) as a separable matmul composition
        k0, b0 = _ConvParams((3, 3, 1, 4), name="encoder_0")()
        if (ih, iw) != (h0, w0):
            a_mats = [
                (_stride2_tap_matrix(oh, ih, d) @ _bilinear_matrix(ih, h0, False))
                for d in range(3)
            ]
            b_mats = [
                (_stride2_tap_matrix(ow, iw, d) @ _bilinear_matrix(iw, w0, False))
                for d in range(3)
            ]
        else:
            a_mats = [_stride2_tap_matrix(oh, ih, d) for d in range(3)]
            b_mats = [_stride2_tap_matrix(ow, iw, d) for d in range(3)]
        a = jnp.stack(a_mats).astype(dt)  # (3, oh, H0)
        bm = jnp.stack(b_mats)  # (3, ow, W0) f32
        xm = x[..., 0].astype(dt)  # (B, H0, W0)
        t = jnp.einsum(
            "doh,bhw->bdow", a, xm, preferred_element_type=jnp.float32
        ).astype(dt)  # (B, 3, oh, W0)
        # fold the 3x3 kernel's horizontal taps AND output channels into
        # the column matrices: C2[d, v, w*4+c] = sum_e k0[d,e,c] bm[e,w,v].
        # One (B*oh, W0) @ (W0, ow*4) matmul then yields stage-0 output
        # directly in channel-minor flat layout — the old 3-einsum chain
        # materialized a 95 MB (B, 3, oh, 3, ow) f32 intermediate and
        # profiled 1.4 ms against a ~0.5 ms matmul floor.
        c2 = jnp.einsum(
            "dec,ewv->dvwc", k0[:, :, 0, :].astype(jnp.float32), bm
        ).reshape(3, w0, ow * 4).astype(dt)
        y = jnp.einsum(
            "bdov,dvm->bom", t, c2, preferred_element_type=jnp.float32
        )  # (B, oh, ow*4) f32
        y = y + jnp.tile(b0.astype(jnp.float32), ow)
        x = (y.reshape(b, oh, ow, 4)).astype(dt)
        x = gelu_exact(LayerNorm2d(name="encoder_ln_0")(x))

        # ---- remaining stages: channels are wide enough for the conv path
        chans = 4
        for i in range(1, self.num_layers):
            chans *= self.stride**2
            x = nn.Conv(
                chans, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding=self.padding,
                dtype=self.dtype, name=f"encoder_{i}",
            )(x)
            x = gelu_exact(LayerNorm2d(name=f"encoder_ln_{i}")(x))
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="encoder_out")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (memory.py:82): dw7x7 -> LN -> 1x1 -> GELU -> 1x1,
    layer scale, residual."""

    kernel_size: int = 7
    layer_scale_init: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from efficientsam3_tpu.ops.pallas.depthwise import (
            depthwise_conv2d,
            use_pallas_depthwise,
        )

        d = x.shape[-1]
        if use_pallas_depthwise(x):
            # one-HBM-pass Pallas depthwise (XLA's lowering re-reads the map
            # once per tap: 49 x 21 MB = 1.25 ms at the tracker shape)
            k, b_ = _ConvParams(
                (self.kernel_size, self.kernel_size, 1, d), name="dwconv"
            )()
            dt = self.dtype or x.dtype
            y = depthwise_conv2d(x.astype(dt), k, b_)
        else:
            y = nn.Conv(
                d, (self.kernel_size, self.kernel_size),
                padding=self.kernel_size // 2,
                feature_group_count=d, dtype=self.dtype, name="dwconv",
            )(x)
        y = LayerNorm2d(name="norm")(y)
        y = nn.Dense(4 * d, dtype=self.dtype, name="pwconv1")(y)
        y = nn.Dense(d, dtype=self.dtype, name="pwconv2")(gelu_exact(y))
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (d,)
        )
        return x + gamma * y


class MemoryEncoder(nn.Module):
    """(pixel feats (B, Hm, Wm, C), mask logits (B, H, W, 1)) ->
    (memory (B, Hm, Wm, out_dim), pos (Hm, Wm, out_dim)). memory.py:158."""

    out_dim: int = 64
    in_dim: int = 256
    num_fuser_layers: int = 2
    sigmoid_scale: float = 20.0
    sigmoid_bias: float = -10.0
    interpol_size: Optional[tuple] = (1152, 1152)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pix_feat, mask_logits, skip_mask_sigmoid: bool = False):
        m = mask_logits
        if not skip_mask_sigmoid:
            m = jax.nn.sigmoid(m)
        masks = MaskDownSampler(
            self.in_dim, interpol_size=self.interpol_size, dtype=self.dtype,
            name="mask_downsampler",
        )(m)
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(
            pix_feat
        )
        x = x + masks
        for i in range(self.num_fuser_layers):
            x = CXBlock(dtype=self.dtype, name=f"fuser_{i}")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)
        pos = sine_pos_embed_2d(x.shape[1], x.shape[2], self.out_dim).astype(x.dtype)
        return x, pos
