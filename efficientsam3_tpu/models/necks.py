"""SimpleFPN dual neck (ViTDet-style), flax NHWC.

Mirrors reference sam3/sam3/model/necks.py:13 (Sam3DualViTDetNeck): from the
single trunk map (72x72x1024), build 4 scales:
  4.0x: convT2 -> GELU -> convT2          (288, dim/4)
  2.0x: convT2                            (144, dim/2)
  1.0x: identity                          (72,  dim)
  0.5x: maxpool2                          (36,  dim)
each followed by 1x1 conv -> 3x3 conv to d_model=256, plus sine position
embeddings. An optional cloned "SAM2 neck" (same structure, separate
weights) feeds the tracker / SAM-task heads.

TPU notes: the whole pyramid is one jitted region; position embeddings are
static-shape constants folded by XLA (models/common.py sine_pos_embed_2d).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import (
    ConvTranspose2x,
    gelu_exact,
    sine_pos_embed_2d,
)


class _ScaleBranch(nn.Module):
    scale: float
    d_model: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        if self.scale == 4.0:
            x = ConvTranspose2x(dim // 2, dtype=self.dtype, name="dconv_0")(x)
            x = gelu_exact(x)
            x = ConvTranspose2x(dim // 4, dtype=self.dtype, name="dconv_1")(x)
        elif self.scale == 2.0:
            x = ConvTranspose2x(dim // 2, dtype=self.dtype, name="dconv_0")(x)
        elif self.scale == 1.0:
            pass
        elif self.scale == 0.5:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        else:
            raise ValueError(f"unsupported scale {self.scale}")
        x = nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name="conv_1x1")(x)
        return nn.Conv(
            self.d_model, (3, 3), padding=1, dtype=self.dtype, name="conv_3x3"
        )(x)


class SimpleFPNNeck(nn.Module):
    """One neck: trunk map -> list of (feature, pos_embed) per scale."""

    d_model: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    num_pos_feats: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        feats, poss = [], []
        for i, s in enumerate(self.scale_factors):
            f = _ScaleBranch(s, self.d_model, dtype=self.dtype, name=f"convs_{i}")(x)
            pe = sine_pos_embed_2d(f.shape[1], f.shape[2], self.num_pos_feats)
            feats.append(f)
            poss.append(pe.astype(f.dtype))
        return feats, poss


class DualFPNNeck(nn.Module):
    """SAM3 neck + optional cloned SAM2 neck over the same trunk output.

    Input: trunk feature map (B, 72, 72, 1024). Returns
    (sam3_feats, sam3_pos, sam2_feats | None, sam2_pos | None).
    """

    d_model: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    add_sam2_neck: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        sam3_feats, sam3_pos = SimpleFPNNeck(
            self.d_model, self.scale_factors, dtype=self.dtype, name="sam3"
        )(x)
        sam2_feats = sam2_pos = None
        if self.add_sam2_neck:
            sam2_feats, sam2_pos = SimpleFPNNeck(
                self.d_model, self.scale_factors, dtype=self.dtype, name="sam2"
            )(x)
        return sam3_feats, sam3_pos, sam2_feats, sam2_pos
