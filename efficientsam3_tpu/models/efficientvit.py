"""EfficientViT student backbone (b0/b1/b2) in flax, NHWC.

Architecture per reference sam3/sam3/backbones/efficientvit/efficientvit/
backbone.py:33-196 and nn/ops.py (ConvLayer :39, DSConv :273, MBConv :315,
LiteMLA :521, EfficientViTBlock :674): conv stem with depthwise-separable
blocks, two MBConv stages, two attention stages of [MBConv-downsample +
(LiteMLA + MBConv) x depth].

TPU-first notes:
  - NHWC + flax convs -> XLA picks MXU-friendly layouts; depthwise convs
    lower to VPU-fused ops.
  - LiteMLA's linear attention is expressed as two batched matmuls over
    (heads, dim+1, HW) with the ones-row trick for the normalizer; no
    torch autocast dance — we simply run the attention block in fp32
    (cheap: dim is 16/32) while convs stay in the compute dtype.
  - The reference's fused Triton RMSNorm 2d (nn/triton_rms_norm.py) is a
    Pallas kernel in ops/pallas/rms_norm.py; EfficientViT-SAM variants that
    use it plug it in via `norm='rms2d'`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def hardswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


EVIT_ACT = {
    "hswish": hardswish,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    None: None,
}


class ConvNormAct(nn.Module):
    """Conv2d + optional BN + optional activation (ops.py:39 ConvLayer)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    norm: Optional[str] = "bn2d"
    act: Optional[str] = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.norm == "bn2d":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="norm",
            )(x)
        act = EVIT_ACT[self.act]
        if act is not None:
            x = act(x)
        return x


class DSConv(nn.Module):
    """Depthwise-separable conv (ops.py:273)."""

    features: int
    stride: int = 1
    use_bias: tuple = (False, False)
    norm: tuple = ("bn2d", "bn2d")
    act: tuple = ("relu6", None)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        x = ConvNormAct(
            c, 3, self.stride, groups=c, use_bias=self.use_bias[0],
            norm=self.norm[0], act=self.act[0], dtype=self.dtype, name="depth_conv",
        )(x, train=train)
        x = ConvNormAct(
            self.features, 1, use_bias=self.use_bias[1],
            norm=self.norm[1], act=self.act[1], dtype=self.dtype, name="point_conv",
        )(x, train=train)
        return x


class MBConv(nn.Module):
    """Inverted-bottleneck conv (ops.py:315)."""

    features: int
    stride: int = 1
    expand_ratio: float = 4.0
    use_bias: tuple = (False, False, False)
    norm: tuple = ("bn2d", "bn2d", "bn2d")
    act: tuple = ("relu6", "relu6", None)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mid = round(x.shape[-1] * self.expand_ratio)
        x = ConvNormAct(
            mid, 1, use_bias=self.use_bias[0], norm=self.norm[0],
            act=self.act[0], dtype=self.dtype, name="inverted_conv",
        )(x, train=train)
        x = ConvNormAct(
            mid, 3, self.stride, groups=mid, use_bias=self.use_bias[1],
            norm=self.norm[1], act=self.act[1], dtype=self.dtype, name="depth_conv",
        )(x, train=train)
        x = ConvNormAct(
            self.features, 1, use_bias=self.use_bias[2], norm=self.norm[2],
            act=self.act[2], dtype=self.dtype, name="point_conv",
        )(x, train=train)
        return x


class _GroupedPointwise(nn.Module):
    """Grouped 1x1 conv computed as a block-diagonal einsum.

    XLA's TPU group-conv lowering costs ~0.34 ms at LiteMLA's stage-3 shape
    (63^2 x 384, 24 groups) vs ~0 for the einsum (measured). The parameter
    keeps flax Conv's (1, 1, in_per_group, out) kernel shape and the same
    module name, so checkpoints and torch converters are unchanged.
    """

    features: int
    groups: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        in_pg = c // self.groups
        out_pg = self.features // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, in_pg, self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        xg = x.reshape(b, h * w, self.groups, in_pg)
        wg = kernel.reshape(in_pg, self.groups, out_pg).astype(x.dtype)
        y = jnp.einsum("bngi,igj->bngj", xg, wg)
        return y.reshape(b, h, w, self.features)


class LiteMLA(nn.Module):
    """Lightweight multi-scale linear attention (ops.py:521).

    ReLU-kernel linear attention: out = (v~ @ k^T @ q) with v~ = [v; 1],
    normalized by the appended ones row. All matmuls batched over heads.
    """

    features: int
    head_dim: int = 16
    heads_ratio: float = 1.0
    scales: Sequence[int] = (5,)
    eps: float = 1e-15
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        heads = int(c // self.head_dim * self.heads_ratio)
        total = heads * self.head_dim
        qkv = ConvNormAct(
            3 * total, 1, use_bias=False, norm=None, act=None,
            dtype=self.dtype, name="qkv",
        )(x, train=train)
        multi = [qkv]
        for si, s in enumerate(self.scales):
            y = nn.Conv(
                3 * total, (s, s), padding=s // 2, feature_group_count=3 * total,
                use_bias=False, dtype=self.dtype, name=f"aggreg_{si}_dw",
            )(qkv)
            y = _GroupedPointwise(
                3 * total, groups=3 * heads, dtype=self.dtype,
                name=f"aggreg_{si}_pw",
            )(y)
            multi.append(y)
        qkv_ms = jnp.concatenate(multi, axis=-1)  # (B, H, W, 3*total*(1+S))

        n_groups = qkv_ms.shape[-1] // (3 * self.d)
        # (B, HW, groups, 3d) in fp32 (reference ops.py:521 computes the
        # linear attention in float); contraction over HW runs on the MXU
        # directly in this layout - no (B, g, 3d, HW) transpose needed
        z = qkv_ms.reshape(b, h * w, n_groups, 3 * self.d).astype(jnp.float32)
        q = jax.nn.relu(z[..., : self.d])
        k = jax.nn.relu(z[..., self.d : 2 * self.d])
        v = z[..., 2 * self.d :]
        ones = jnp.ones_like(v[..., :1])
        v1 = jnp.concatenate([v, ones], axis=-1)  # (B, HW, g, d+1)
        vk = jnp.einsum("bngd,bnge->bgde", v1, k, preferred_element_type=jnp.float32)
        out = jnp.einsum("bgde,bnge->bngd", vk, q, preferred_element_type=jnp.float32)
        out = out[..., : self.d] / (out[..., self.d :] + self.eps)
        out = out.reshape(b, h, w, n_groups * self.d)
        out = out.astype(x.dtype)
        return ConvNormAct(
            self.features, 1, use_bias=False, norm="bn2d", act=None,
            dtype=self.dtype, name="proj",
        )(out, train=train)

    @property
    def d(self):
        return self.head_dim


class EfficientViTBlock(nn.Module):
    """LiteMLA (residual) + MBConv (residual) (ops.py:674)."""

    head_dim: int = 16
    expand_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        x = x + LiteMLA(
            c, head_dim=self.head_dim, dtype=self.dtype, name="context_module"
        )(x, train=train)
        x = x + MBConv(
            c,
            expand_ratio=self.expand_ratio,
            use_bias=(True, True, False),
            norm=(None, None, "bn2d"),
            act=("hswish", "hswish", None),
            dtype=self.dtype,
            name="local_module",
        )(x, train=train)
        return x


class EfficientViTBackbone(nn.Module):
    """Returns the final-stage feature map (stride 32), NHWC.

    Matches reference backbone.py:33: stage_final == stages[-1] output.
    """

    width_list: Sequence[int] = (8, 16, 32, 64, 128)
    depth_list: Sequence[int] = (1, 2, 2, 2, 2)
    head_dim: int = 16
    expand_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        w = self.width_list
        d = self.depth_list
        # input stem: stride-2 conv + depth_list[0] residual DSConv blocks
        x = ConvNormAct(
            w[0], 3, 2, norm="bn2d", act="hswish", dtype=self.dtype, name="stem_conv"
        )(x, train=train)
        for i in range(d[0]):
            x = x + DSConv(
                w[0], 1, act=("hswish", None), dtype=self.dtype, name=f"stem_block_{i}"
            )(x, train=train)
        # stages 1-2: MBConv stages
        for s, (ws, ds) in enumerate(zip(w[1:3], d[1:3]), start=1):
            for i in range(ds):
                stride = 2 if i == 0 else 1
                block = MBConv(
                    ws, stride, self.expand_ratio,
                    act=("hswish", "hswish", None),
                    dtype=self.dtype, name=f"stage{s}_block_{i}",
                )
                y = block(x, train=train)
                x = y if stride == 2 else x + y
        # stages 3-4: downsample MBConv (fewer_norm) + EfficientViT blocks
        for s, (ws, ds) in enumerate(zip(w[3:], d[3:]), start=3):
            x = MBConv(
                ws, 2, self.expand_ratio,
                use_bias=(True, True, False),
                norm=(None, None, "bn2d"),
                act=("hswish", "hswish", None),
                dtype=self.dtype, name=f"stage{s}_down",
            )(x, train=train)
            for i in range(ds):
                x = EfficientViTBlock(
                    head_dim=self.head_dim,
                    expand_ratio=self.expand_ratio,
                    dtype=self.dtype,
                    name=f"stage{s}_block_{i}",
                )(x, train=train)
        return x


def efficientvit_b0(**kw):
    return EfficientViTBackbone(
        width_list=(8, 16, 32, 64, 128), depth_list=(1, 2, 2, 2, 2), head_dim=16, **kw
    )


def efficientvit_b1(**kw):
    return EfficientViTBackbone(
        width_list=(16, 32, 64, 128, 256), depth_list=(1, 2, 3, 3, 4), head_dim=16, **kw
    )


def efficientvit_b2(**kw):
    return EfficientViTBackbone(
        width_list=(24, 48, 96, 192, 384), depth_list=(1, 3, 4, 4, 6), head_dim=32, **kw
    )


EFFICIENTVIT_VARIANTS = {
    "b0": efficientvit_b0,
    "b1": efficientvit_b1,
    "b2": efficientvit_b2,
}

EFFICIENTVIT_OUT_CHANNELS = {"b0": 128, "b1": 256, "b2": 384}
