"""TinyViT student backbone (5m/11m/21m) in flax, NHWC.

Architecture per reference sam3/sam3/backbones/tiny_vit.py: conv patch embed
(stride 4), one MBConv stage, three windowed-attention stages with cached
relative attention biases, PatchMerging (1x1 -> dw3x3 s2 -> 1x1, all
Conv+BN) between stages.

TPU-first notes:
  - Window partition is pure reshape/transpose on NHWC (no F.pad branch at
    trace time — pad sizes are static per resolution).
  - The (N, N) attention-bias index table is computed in numpy at trace
    time and baked into the graph as a constant gather of the
    (heads, num_offsets) parameter; XLA folds it into the attention bias
    add (the reference caches it as a buffer, tiny_vit.py:243-258).
  - Attention (LeViT-style, qkv widths split as key/key/attn_ratio*key)
    runs as batched einsums over (B*windows, heads, N, d).
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import DropPath, gelu_exact


class ConvBN(nn.Module):
    """Conv (no bias) + BN (reference tiny_vit.py:31 Conv2d_BN)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="c",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)


class MBConv(nn.Module):
    """Residual MBConv with GELU after the residual (tiny_vit.py:88)."""

    expand_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        hidden = int(c * self.expand_ratio)
        y = gelu_exact(ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train=train))
        y = gelu_exact(
            ConvBN(hidden, 3, 1, 1, groups=hidden, dtype=self.dtype, name="conv2")(
                y, train=train
            )
        )
        y = ConvBN(c, 1, dtype=self.dtype, name="conv3")(y, train=train)
        y = DropPath(self.drop_path)(y, train=train)
        return gelu_exact(x + y)


class PatchMerging(nn.Module):
    """1x1 expand -> GELU -> dw3x3 s2 -> GELU -> 1x1 (tiny_vit.py:128)."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, train=train)
        x = gelu_exact(x)
        x = ConvBN(
            self.out_dim, 3, 2, 1, groups=self.out_dim, dtype=self.dtype, name="conv2"
        )(x, train=train)
        x = gelu_exact(x)
        return ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, train=train)


def _attention_bias_idxs(ws: int) -> np.ndarray:
    """(N, N) index table into the unique-offset bias vocabulary."""
    points = list(itertools.product(range(ws), range(ws)))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n)


class WindowAttention(nn.Module):
    """LeViT-style attention with learned relative biases (tiny_vit.py:219).

    Input: (B, N, C) window tokens. LayerNorm is applied inside (pre-qkv).
    """

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int = 1
    window_size: int = 7
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        kd = self.key_dim
        d = int(self.attn_ratio * kd)
        nh = self.num_heads
        idxs = _attention_bias_idxs(self.window_size)
        num_offsets = int(idxs.max()) + 1
        biases = self.param(
            "attention_biases", nn.initializers.zeros, (nh, num_offsets)
        )
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense((2 * kd + d) * nh, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, nh, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # force jnp (converted checkpoints may carry numpy leaves, and numpy
        # indexing with a traced constant index would fail)
        bias = jnp.asarray(biases)[:, jnp.asarray(idxs)]  # (nh, N, N)
        logits = (
            jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
            * (kd**-0.5)
            + bias[None].astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, nh * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed attention + depthwise local conv + MLP (tiny_vit.py:296)."""

    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    local_conv_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        ws = self.window_size
        res = x
        if h == ws and w == ws:
            y = WindowAttention(
                c, c // self.num_heads, self.num_heads, 1, ws, dtype=self.dtype,
                name="attn",
            )(x.reshape(b, h * w, c)).reshape(b, h, w, c)
        else:
            pad_b = (ws - h % ws) % ws
            pad_r = (ws - w % ws) % ws
            y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            ph, pw = h + pad_b, w + pad_r
            nh_, nw_ = ph // ws, pw // ws
            y = y.reshape(b, nh_, ws, nw_, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b * nh_ * nw_, ws * ws, c)
            y = WindowAttention(
                c, c // self.num_heads, self.num_heads, 1, ws, dtype=self.dtype,
                name="attn",
            )(y)
            y = y.reshape(b, nh_, nw_, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, ph, pw, c)[:, :h, :w]
        x = res + DropPath(self.drop_path)(y, train=train)

        x = ConvBN(
            c, self.local_conv_size, 1, self.local_conv_size // 2, groups=c,
            dtype=self.dtype, name="local_conv",
        )(x, train=train)

        # MLP with pre-norm (tiny_vit.py:196 Mlp)
        z = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = gelu_exact(z)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(z)
        return x + DropPath(self.drop_path)(z, train=train)


class TinyViT(nn.Module):
    """Feature trunk: NHWC in, final-stage NHWC map out (stride ~32).

    Matches the reference's trunk usage (model_builder.py:887-902): patch
    embed + all four stages, output reshaped to a square spatial map.
    """

    embed_dims: Sequence[int] = (64, 128, 256, 448)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 8, 14)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    mbconv_expand_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dims = self.embed_dims
        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth).tolist()

        # patch embed: two stride-2 ConvBN with GELU between
        x = ConvBN(dims[0] // 2, 3, 2, 1, dtype=self.dtype, name="patch_embed_0")(
            x, train=train
        )
        x = gelu_exact(x)
        x = ConvBN(dims[0], 3, 2, 1, dtype=self.dtype, name="patch_embed_1")(
            x, train=train
        )

        di = 0
        for stage in range(len(self.depths)):
            for blk in range(self.depths[stage]):
                if stage == 0:
                    x = MBConv(
                        self.mbconv_expand_ratio, dpr[di], dtype=self.dtype,
                        name=f"stage0_block_{blk}",
                    )(x, train=train)
                else:
                    x = TinyViTBlock(
                        self.num_heads[stage],
                        self.window_sizes[stage],
                        self.mlp_ratio,
                        dpr[di],
                        dtype=self.dtype,
                        name=f"stage{stage}_block_{blk}",
                    )(x, train=train)
                di += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging(
                    dims[stage + 1], dtype=self.dtype, name=f"downsample_{stage}"
                )(x, train=train)
        return x


def tiny_vit_5m(**kw):
    return TinyViT(
        embed_dims=(64, 128, 160, 320), depths=(2, 2, 6, 2),
        num_heads=(2, 4, 5, 10), window_sizes=(7, 7, 14, 7),
        drop_path_rate=0.0, **kw,
    )


def tiny_vit_11m(**kw):
    return TinyViT(
        embed_dims=(64, 128, 256, 448), depths=(2, 2, 6, 2),
        num_heads=(2, 4, 8, 14), window_sizes=(7, 7, 14, 7),
        drop_path_rate=0.1, **kw,
    )


def tiny_vit_21m(**kw):
    return TinyViT(
        embed_dims=(96, 192, 384, 576), depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 18), window_sizes=(7, 7, 14, 7),
        drop_path_rate=0.2, **kw,
    )


TINYVIT_VARIANTS = {"5m": tiny_vit_5m, "11m": tiny_vit_11m, "21m": tiny_vit_21m}
TINYVIT_OUT_CHANNELS = {"5m": 320, "11m": 448, "21m": 576}
