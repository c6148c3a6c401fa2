"""Text towers: SAM3 teacher (CLIP TextTransformer) + resizer.

Mirrors reference sam3/sam3/model/text_encoder_ve.py: 24-layer width-1024
CLIP-style causal transformer (pre-LN residual attention blocks), ln_final,
token outputs resized 1024 -> 256 by a linear `resizer`
(builder: model_builder.py:487-496).

TPU notes: fixed (B, ctx) int32 inputs; the causal mask is a static constant;
the whole tower is one jitted region; tokenization stays on host
(utils/tokenizer.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import MultiheadAttention, gelu_exact


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attn + MLP (reference text_encoder_ve.py:13)."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_bias=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + MultiheadAttention(
            self.width, self.heads, dtype=self.dtype, name="attn"
        )(h, h, h, attn_mask=attn_bias)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype, name="c_fc")(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(gelu_exact(h))
        return x + h


class TextTransformer(nn.Module):
    """CLIP text tower returning per-token features (pool_type='none')."""

    context_length: int = 32
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    mlp_ratio: float = 4.0
    output_dim: int = 512  # CLIP default; unused by the SAM3 token path
    causal: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, L) int32 -> (B, L, width) final-LN token features."""
        _, seq = tokens.shape
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[:seq]
        bias = None
        if self.causal:
            neg = jnp.finfo(jnp.float32).min
            bias = jnp.triu(jnp.full((seq, seq), neg, jnp.float32), k=1)[None, None]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.mlp_ratio, dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x, attn_bias=bias)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # NOTE: the checkpoint's text_projection is only applied to the pooled
        # output, which the SAM3 pipeline never consumes (pool_type='none',
        # reference text_encoder_ve.py:242-250); we keep the param for
        # checkpoint compatibility but do not use it.
        self.param(
            "text_projection",
            nn.initializers.normal(0.01),
            (self.width, self.output_dim),
        )
        return x


class VETextEncoder(nn.Module):
    """Teacher text encoder: tokens -> (token feats resized to d_model, mask).

    Returns (text_memory (B, L, d_model), pad_mask (B, L) True = pad).
    """

    d_model: int = 256
    context_length: int = 32
    width: int = 1024
    heads: int = 16
    layers: int = 24
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens):
        feats = TextTransformer(
            context_length=self.context_length,
            width=self.width,
            heads=self.heads,
            layers=self.layers,
            dtype=self.dtype,
            name="encoder",
        )(tokens)
        resized = nn.Dense(self.d_model, dtype=self.dtype, name="resizer")(feats)
        pad_mask = tokens == 0
        return resized, pad_mask
