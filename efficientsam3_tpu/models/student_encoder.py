"""Student vision encoder: trunk + projection head -> 72x72x1024 embedding.

Mirrors reference sam3/sam3/model_builder.py:764-787 (ImageStudentEncoder):
student trunk (EfficientViT / RepViT / TinyViT) -> 1x1 conv (no bias) + BN +
GELU + 3x3 conv -> bilinear resize to the teacher's 72x72 token grid at 1024
channels, so the student drops into the same neck/FPN as the ViT-H teacher.

The bilinear resize uses ops.interpolate's matmul formulation (MXU).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import gelu_exact
from efficientsam3_tpu.ops.interpolate import resize_bilinear


class StudentProjectionHead(nn.Module):
    """1x1 conv + BN + GELU + 3x3 conv, then resize to embed_size."""

    embed_dim: int = 1024
    embed_size: int = 72
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.embed_dim, (1, 1), use_bias=False, dtype=self.dtype, name="head_0"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="head_1",
        )(x)
        x = gelu_exact(x)
        x = nn.Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype, name="head_3")(x)
        if x.shape[1] != self.embed_size or x.shape[2] != self.embed_size:
            # resize over (H, W): convert NHWC -> NCHW view for the helper
            x = x.transpose(0, 3, 1, 2)
            x = resize_bilinear(x, (self.embed_size, self.embed_size))
            x = x.transpose(0, 2, 3, 1)
        return x


class ImageStudentEncoder(nn.Module):
    """trunk -> projection head. Returns (B, 72, 72, 1024) NHWC."""

    trunk: nn.Module
    embed_dim: int = 1024
    embed_size: int = 72
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = self.trunk(x, train=train)
        return StudentProjectionHead(
            self.embed_dim, self.embed_size, dtype=self.dtype, name="head"
        )(feats, train=train)
