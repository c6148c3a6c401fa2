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


class MaskDownSampler(nn.Module):
    """(B, H, W, 1) mask logits -> (B, H/16, W/16, embed_dim) after an
    optional antialiased resize to interpol_size (memory.py:19)."""

    embed_dim: int = 256
    stride: int = 2
    kernel_size: int = 3
    padding: int = 1
    num_layers: int = 4  # total stride 16
    interpol_size: Optional[tuple] = (1152, 1152)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.interpol_size is not None and x.shape[1:3] != tuple(self.interpol_size):
            x = jax.image.resize(
                x.astype(jnp.float32),
                (x.shape[0], *self.interpol_size, x.shape[-1]),
                "linear",
                antialias=True,
            )
        chans = 1
        for i in range(self.num_layers):
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
        d = x.shape[-1]
        y = nn.Conv(
            d, (self.kernel_size, self.kernel_size), padding=self.kernel_size // 2,
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
