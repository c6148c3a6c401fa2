"""Segmentation head: pixel decoder + prompt cross-attention + mask/semantic
prediction.

Mirrors reference sam3/sam3/model/maskformer_segmentation.py
(PixelDecoder :172, UniversalSegmentationHead :222) with the builder config
(model_builder.py:205-230): 3 nearest-neighbor upsampling stages with
conv3x3 + GroupNorm(8) + relu, a single prompt cross-attention on the fused
encoder tokens, instance/semantic 1x1 heads, and query-to-pixel dot-product
mask prediction.

TPU notes: NHWC; nearest upsample is a reshape-broadcast (exactly matches
torch 'nearest' for integer scale factors); the query-pixel einsum runs on
the MXU with fp32 accumulation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import MLP, MultiheadAttention


def nearest_upsample_2x(x):
    """NHWC 2x nearest upsample via broadcast (torch 'nearest' parity for
    integer factors)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class PixelDecoder(nn.Module):
    """FPN top-down merge: upsample + add + conv + GN + relu per stage."""

    hidden_dim: int = 256
    num_stages: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats):
        """feats: list of NHWC maps fine->coarse, e.g. [288, 144, 72].

        The last entry is the starting (coarsest) map; reference
        maskformer_segmentation.py:203-219.
        """
        prev = feats[-1]
        for i, cur in enumerate(reversed(feats[:-1])):
            scale = cur.shape[1] // prev.shape[1]
            up = prev
            for _ in range(int(scale).bit_length() - 1):
                up = nearest_upsample_2x(up)
            prev = cur + up
            prev = nn.Conv(
                self.hidden_dim, (3, 3), padding=1, dtype=self.dtype,
                name=f"conv_layers_{i}",
            )(prev)
            # dtype=self.dtype keeps the 288^2 map in bf16 through the norm
            # (flax computes the mean/var statistics in f32 regardless);
            # dtype=None would promote to f32 and double the HBM traffic
            prev = nn.GroupNorm(
                num_groups=8, epsilon=1e-5, dtype=self.dtype, name=f"norms_{i}"
            )(prev)
            prev = jax.nn.relu(prev)
        return prev


class UniversalSegmentationHead(nn.Module):
    """Returns pred_masks (B, NQ, Hm, Wm) + semantic_seg (B, Hm, Wm, 1)."""

    hidden_dim: int = 256
    num_heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        backbone_feats,  # list of NHWC FPN maps (fine -> coarse)
        obj_queries,  # (B, NQ, C) final-layer queries (o2o+o2m)
        encoder_hidden_states,  # (B, HW, C) fused memory (coarsest level)
        prompt=None,  # (B, T, C)
        prompt_mask=None,  # (B, T) True = pad
        *,
        train: bool = False,
        stage: Optional[str] = None,  # 'segxattn'/'pixdec' profiling stops
    ):
        d = self.hidden_dim
        b, hw, _ = encoder_hidden_states.shape

        # prompt cross-attention on encoder tokens (pre-norm, residual)
        if prompt is not None:
            t2 = nn.LayerNorm(epsilon=1e-5, name="cross_attn_norm")(
                encoder_hidden_states
            )
            t2 = MultiheadAttention(
                d, self.num_heads, 0.0, dtype=self.dtype, name="cross_attend_prompt"
            )(t2, prompt, prompt, key_padding_mask=prompt_mask)
            encoder_hidden_states = t2 + encoder_hidden_states

        if stage == "segxattn":
            return {"pred_masks": encoder_hidden_states, "semantic_seg": None}

        # replace the coarsest FPN level with the encoder tokens
        h, w = backbone_feats[-1].shape[1:3]
        assert h * w == hw, "encoder memory must match coarsest FPN level"
        enc_map = encoder_hidden_states.reshape(b, h, w, d)
        feats = list(backbone_feats[:-1]) + [enc_map]

        pixel_embed = PixelDecoder(d, dtype=self.dtype, name="pixel_decoder")(feats)
        instance_embeds = nn.Conv(
            d, (1, 1), dtype=self.dtype, name="instance_seg_head"
        )(pixel_embed)
        semantic_seg = nn.Conv(1, (1, 1), dtype=self.dtype, name="semantic_seg_head")(
            pixel_embed
        )
        if stage == "pixdec":
            return {"pred_masks": instance_embeds, "semantic_seg": semantic_seg}

        mask_embed = MLP(d, d, 3, name="mask_embed")(obj_queries)  # (B, NQ, C)
        masks = jnp.einsum(
            "bqc,bhwc->bqhw", mask_embed, instance_embeds,
            preferred_element_type=jnp.float32,
        ).astype(obj_queries.dtype)
        return {"pred_masks": masks, "semantic_seg": semantic_seg}
