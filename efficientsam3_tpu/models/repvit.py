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
            y = ConvBN(c, 3, 2, 1, groups=c, deploy=self.deploy, dtype=self.dtype, name="tm_dw")(
                x, train=train
            )
            if self.use_se:
                y = SqueezeExcite(dtype=self.dtype, name="tm_se")(y)
            y = ConvBN(self.out_channels, 1, deploy=self.deploy, dtype=self.dtype, name="tm_pw")(
                y, train=train
            )
        else:
            y = RepVGGDW(deploy=self.deploy, dtype=self.dtype, name="tm_repvgg")(
                x, train=train
            )
            if self.use_se:
                y = SqueezeExcite(dtype=self.dtype, name="tm_se")(y)
        # channel mixer (residual): pw expand 2x -> GELU -> pw project
        z = ConvBN(2 * self.out_channels, 1, deploy=self.deploy, dtype=self.dtype, name="cm_expand")(
            y, train=train
        )
        z = gelu_exact(z)
        z = ConvBN(self.out_channels, 1, deploy=self.deploy, dtype=self.dtype, name="cm_project")(
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
        x = ConvBN(c0 // 2, 3, 2, 1, deploy=self.deploy, dtype=self.dtype, name="patch_embed_0")(
            x, train=train
        )
        x = gelu_exact(x)
        x = ConvBN(c0, 3, 2, 1, deploy=self.deploy, dtype=self.dtype, name="patch_embed_1")(x, train=train)
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

def _fuse_conv_bn(conv_kernel, bn_params, bn_stats, eps=1e-5):
    """Fold BN into a conv kernel (reference Conv2d_BN.fuse, repvit.py:38).
    kernel HWIO; returns (kernel, bias)."""
    import numpy as np

    scale = np.asarray(bn_params["scale"]) / np.sqrt(
        np.asarray(bn_stats["var"]) + eps
    )
    kernel = np.asarray(conv_kernel) * scale  # broadcast over O (last axis)
    bias = np.asarray(bn_params["bias"]) - np.asarray(bn_stats["mean"]) * scale
    return kernel, bias


def fuse_repvit_params(params: dict, stats: dict, cfgs) -> dict:
    """Train-form RepViT params -> deploy-form (deploy=True) params.

    Mirrors the reference's fuse() chain (repvit.py:38,64,96): every
    Conv+BN folds into one biased conv; the RepVGGDW three-branch mixer
    (dw3x3+BN, dw1x1, identity) collapses into a single dw3x3 conv followed
    by folding the outer BN. Pure pytree -> pytree on host numpy.
    """
    import numpy as np

    def conv_bn(p, s):
        k, b = _fuse_conv_bn(p["c"]["kernel"], p["bn"], s["bn"])
        return {"c": {"kernel": k, "bias": b}}

    out = {
        "patch_embed_0": conv_bn(params["patch_embed_0"], stats["patch_embed_0"]),
        "patch_embed_1": conv_bn(params["patch_embed_1"], stats["patch_embed_1"]),
    }
    for i, (c, use_se, s_) in enumerate(cfgs):
        bp = params[f"blocks_{i}"]
        bs = stats[f"blocks_{i}"]
        nb = {}
        if s_ == 2:
            nb["tm_dw"] = conv_bn(bp["tm_dw"], bs["tm_dw"])
            nb["tm_pw"] = conv_bn(bp["tm_pw"], bs["tm_pw"])
            if use_se:
                nb["tm_se"] = bp["tm_se"]
        else:
            rv = bp["tm_repvgg"]
            rs = bs["tm_repvgg"]
            # branch 1: dw3x3 conv+BN fused
            k3, b3 = _fuse_conv_bn(rv["conv"]["c"]["kernel"], rv["conv"]["bn"], rs["conv"]["bn"])
            # branch 2: dw1x1 conv (biased) padded to 3x3
            k1 = np.asarray(rv["conv1"]["kernel"])  # (1, 1, 1, C)
            b1 = np.asarray(rv["conv1"]["bias"])
            k1p = np.zeros_like(k3)
            k1p[1:2, 1:2] = k1
            # branch 3: identity as a centered dw kernel
            cdim = k3.shape[-1]
            kid = np.zeros_like(k3)
            kid[1, 1, 0, :] = 1.0
            k = k3 + k1p + kid
            b = b3 + b1
            # outer BN folds on top
            scale = np.asarray(rv["bn"]["scale"]) / np.sqrt(
                np.asarray(rs["bn"]["var"]) + 1e-5
            )
            k = k * scale
            b = np.asarray(rv["bn"]["bias"]) + (b - np.asarray(rs["bn"]["mean"])) * scale
            nb["tm_repvgg"] = {"fused": {"kernel": k, "bias": b}}
            if use_se:
                nb["tm_se"] = bp["tm_se"]
        nb["cm_expand"] = conv_bn(bp["cm_expand"], bs["cm_expand"])
        nb["cm_project"] = conv_bn(bp["cm_project"], bs["cm_project"])
        out[f"blocks_{i}"] = nb
    return out


REPVIT_OUT_CHANNELS = {
    "m0.9": 384, "m0_9": 384, "m1.1": 512, "m1_1": 512, "m2.3": 640, "m2_3": 640,
}
