"""RepViT student backbone (m0.9 / m1.1 / m2.3) in flax, NHWC.

Architecture per reference sam3/sam3/backbones/repvit.py:219-507: stride-4
conv stem, then a sequence of RepViTBlocks — stride-2 blocks use
[dw3x3+BN -> optional SE -> pw1x1+BN] token mixing; stride-1 blocks use a
re-parameterizable RepVGG-style depthwise mixer [dw3x3+BN + dw1x1 + identity,
then BN] -> optional SE; channel mixing is a residual pw-expand(GELU)-pw
block with BN (bn_weight_init=0 on the closing BN).

TPU-first notes:
  - Train-time keeps the multi-branch form (needed for distillation
    training); `fuse_repvit_params` folds every Conv+BN (and the RepVGGDW
    three-branch sum) into single conv kernels for inference, mirroring the
    reference's `fuse()` (repvit.py:38,96) but as a pure pytree->pytree
    transform — the flax module graph is reused with `deploy=True`.
  - NHWC layout; depthwise convs use feature_group_count.

SE reduction channels follow timm.layers.SqueezeExcite:
rd = make_divisible(c * 0.25, 8, round_limit=0).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import gelu_exact


def make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, fuseable (reference repvit.py:27)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    deploy: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=self.deploy,
            dtype=self.dtype,
            name="c",
        )(x)
        if not self.deploy:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        return x


class SqueezeExcite(nn.Module):
    """timm-style SE block with rd_ratio 0.25."""

    rd_ratio: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = make_divisible(c * self.rd_ratio, 8, round_limit=0.0)
        se = x.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(rd, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(se)
        se = jax.nn.relu(se)
        se = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(se)
        return x * jax.nn.sigmoid(se)


class RepVGGDW(nn.Module):
    """Depthwise RepVGG mixer: dw3x3+BN + dw1x1 + id, then BN (repvit.py:84).

    In deploy mode the three branches are a single fused dw3x3 conv.
    """

    deploy: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        if self.deploy:
            return nn.Conv(
                c, (3, 3), padding=1, feature_group_count=c, use_bias=True,
                dtype=self.dtype, name="fused",
            )(x)
        y = ConvBN(c, 3, 1, 1, groups=c, dtype=self.dtype, name="conv")(x, train=train)
        y1 = nn.Conv(
            c, (1, 1), feature_group_count=c, use_bias=True, dtype=self.dtype,
            name="conv1",
        )(x)
        out = y + y1 + x
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(out)


class RepViTBlock(nn.Module):
    """Token mixer + residual channel mixer (reference repvit.py:125)."""

    out_channels: int
    stride: int
    use_se: bool
    deploy: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        if self.stride == 2:
            y = ConvBN(c, 3, 2, 1, groups=c, dtype=self.dtype, name="tm_dw")(
                x, train=train
            )
            if self.use_se:
                y = SqueezeExcite(dtype=self.dtype, name="tm_se")(y)
            y = ConvBN(self.out_channels, 1, dtype=self.dtype, name="tm_pw")(
                y, train=train
            )
        else:
            y = RepVGGDW(deploy=self.deploy, dtype=self.dtype, name="tm_repvgg")(
                x, train=train
            )
            if self.use_se:
                y = SqueezeExcite(dtype=self.dtype, name="tm_se")(y)
        # channel mixer (residual): pw expand 2x -> GELU -> pw project
        z = ConvBN(2 * self.out_channels, 1, dtype=self.dtype, name="cm_expand")(
            y, train=train
        )
        z = gelu_exact(z)
        z = ConvBN(self.out_channels, 1, dtype=self.dtype, name="cm_project")(
            z, train=train
        )
        return y + z


class RepViT(nn.Module):
    """Feature trunk: returns the stride-32 final map, NHWC.

    cfgs rows: (channels, use_se, stride) — kernel is always 3, expansion
    always 2x (asserted in the reference block).
    """

    cfgs: Sequence[tuple]
    deploy: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c0 = self.cfgs[0][0]
        x = ConvBN(c0 // 2, 3, 2, 1, dtype=self.dtype, name="patch_embed_0")(
            x, train=train
        )
        x = gelu_exact(x)
        x = ConvBN(c0, 3, 2, 1, dtype=self.dtype, name="patch_embed_1")(x, train=train)
        for i, (c, use_se, s) in enumerate(self.cfgs):
            oc = make_divisible(c, 8)
            x = RepViTBlock(
                oc, s, bool(use_se), deploy=self.deploy, dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, train=train)
        return x


def _m0_9_cfgs():
    # reference repvit.py:280 (k=3, t=2 throughout)
    return (
        [(48, 1, 1), (48, 0, 1), (48, 0, 1), (96, 0, 2)]
        + [(96, 1, 1), (96, 0, 1), (96, 0, 1), (192, 0, 2)]
        + [(192, se, 1) for se in (1, 0) * 7] + [(192, 0, 1)]
        + [(384, 0, 2), (384, 1, 1), (384, 0, 1)]
    )


def _m1_1_cfgs():
    # reference repvit.py:353
    return (
        [(64, 1, 1), (64, 0, 1), (64, 0, 1), (128, 0, 2)]
        + [(128, 1, 1), (128, 0, 1), (128, 0, 1), (256, 0, 2)]
        + [(256, se, 1) for se in (1, 0) * 6] + [(256, 0, 1)]
        + [(512, 0, 2), (512, 1, 1), (512, 0, 1)]
    )


def _m2_3_cfgs():
    # reference repvit.py:442
    return (
        [(80, 1, 1), (80, 0, 1), (80, 1, 1), (80, 0, 1), (80, 1, 1), (80, 0, 1),
         (80, 0, 1), (160, 0, 2)]
        + [(160, 1, 1), (160, 0, 1), (160, 1, 1), (160, 0, 1), (160, 1, 1),
           (160, 0, 1), (160, 0, 1), (320, 0, 2)]
        + [(320, se, 1) for se in (1, 0) * 17] + [(320, 0, 1)]
        + [(640, 0, 2), (640, 1, 1), (640, 0, 1)]
    )


def repvit_m0_9(**kw):
    return RepViT(cfgs=tuple(_m0_9_cfgs()), **kw)


def repvit_m1_1(**kw):
    return RepViT(cfgs=tuple(_m1_1_cfgs()), **kw)


def repvit_m2_3(**kw):
    return RepViT(cfgs=tuple(_m2_3_cfgs()), **kw)


REPVIT_VARIANTS = {
    "m0.9": repvit_m0_9, "m0_9": repvit_m0_9,
    "m1.1": repvit_m1_1, "m1_1": repvit_m1_1,
    "m2.3": repvit_m2_3, "m2_3": repvit_m2_3,
}

REPVIT_OUT_CHANNELS = {
    "m0.9": 384, "m0_9": 384, "m1.1": 512, "m1_1": 512, "m2.3": 640, "m2_3": 640,
}
