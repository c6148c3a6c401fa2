"""Teacher ViT-H trunk (ViTDet) in flax, NHWC.

Mirrors reference sam3/sam3/model/vitdet.py with the builder config
(model_builder.py:70-97): img 1008, patch 14 (72x72 tokens), width 1024,
32 blocks, 16 heads, mlp_ratio 4.625, window 24 with global attention at
blocks (7, 15, 23, 31), tiled absolute position embeddings (24x24 pretrain
grid tiled 3x3), interpolated axial 2D RoPE (pretrain grid 24), ln_pre,
LayerNorm eps 1e-5, patch embed without bias.

TPU-first notes: window partition is reshape/transpose only (72 = 3 * 24,
no padding); attention is batched einsum + fp32 softmax over
(B*windows, heads, 576, 64) for windowed blocks and (B, heads, 5184, 64)
for global blocks — large MXU-friendly shapes. RoPE tables are trace-time
constants. This trunk exists for stage-1 distillation (teacher export) and
teacher-parity evaluation; students replace it at inference.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import DropPath, gelu_exact, sdpa


def axial_rope_cos_sin(
    head_dim: int, end_x: int, end_y: int, theta: float = 10000.0,
    scale_pos: float = 1.0,
):
    """reference sam3/sam3/sam/rope.py:24 with interpolation scaling."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(quarter, dtype=jnp.float32) * 4.0 / head_dim))
    t = jnp.arange(end_x * end_y, dtype=jnp.float32)
    t_x = (t % end_x) * scale_pos
    t_y = jnp.floor(t / end_x) * scale_pos
    ang = jnp.concatenate([jnp.outer(t_x, freqs), jnp.outer(t_y, freqs)], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_pairs(x, cos, sin):
    """Rotate adjacent pairs (torch view_as_complex layout)."""
    x2 = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    out = jnp.stack([a * cos - b * sin, a * sin + b * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class ViTAttention(nn.Module):
    """Packed-qkv attention with axial RoPE (vitdet.py:339)."""

    dim: int
    num_heads: int
    grid_size: int  # tokens per side for this block's attention input
    rope_pt_size: int = 24
    rope_interp: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> same."""
        b, h, w, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale_pos = self.rope_pt_size / self.grid_size if self.rope_interp else 1.0
        cos, sin = axial_rope_cos_sin(hd, self.grid_size, self.grid_size, 10000.0, scale_pos)
        q = apply_rope_pairs(q, cos, sin)
        k = apply_rope_pairs(k, cos, sin)
        out = sdpa(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int  # 0 = global
    grid_size: int  # full token grid per side
    drop_path: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            assert h % ws == 0 and w % ws == 0, "1008/14=72 is divisible by 24"
            nh, nw = h // ws, w // ws
            xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xw = xw.reshape(b * nh * nw, ws, ws, c)
            xw = ViTAttention(
                self.dim, self.num_heads, ws, dtype=self.dtype, name="attn"
            )(xw)
            x = xw.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, h, w, c)
        else:
            x = ViTAttention(
                self.dim, self.num_heads, self.grid_size, dtype=self.dtype, name="attn"
            )(x)
        x = shortcut + DropPath(self.drop_path)(x, train=train)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(gelu_exact(y))
        return x + DropPath(self.drop_path)(y, train=train)


class ViTTrunk(nn.Module):
    """images (B, H, W, 3) -> (B, H/14, W/14, 1024) final feature map."""

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.625
    window_size: int = 24
    global_att_blocks: Sequence[int] = (7, 15, 23, 31)
    pretrain_grid: int = 24  # 336 / 14
    drop_path_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        h, w = x.shape[1:3]

        # tiled absolute position embedding (pretrain 24x24 grid + cls slot)
        n_pre = self.pretrain_grid * self.pretrain_grid
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (n_pre + 1, self.embed_dim),
        )
        grid_pos = pos[1:].reshape(self.pretrain_grid, self.pretrain_grid, -1)
        if (h, w) != (self.pretrain_grid, self.pretrain_grid):
            reps_h = -(-h // self.pretrain_grid)
            reps_w = -(-w // self.pretrain_grid)
            grid_pos = jnp.tile(grid_pos, (reps_h, reps_w, 1))[:h, :w]
        x = x + grid_pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for i in range(self.depth):
            ws = 0 if i in self.global_att_blocks else self.window_size
            block = ViTBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio, ws, h,
                drop_path=dpr[i], dtype=self.dtype, name=f"blocks_{i}",
            )
            if train:
                # per-block activation checkpointing (reference
                # use_act_checkpoint, vitdet.py:838); `train` closed over so
                # it stays static under remat
                x = nn.remat(lambda mdl, xx: mdl(xx, train=True))(block, x)
            else:
                x = block(x)
        return x
