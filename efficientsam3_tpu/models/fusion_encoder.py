"""Fusion encoder: image tokens self-attend and cross-attend to the prompt.

Mirrors reference sam3/sam3/model/encoder.py (TransformerEncoderLayer :13,
TransformerEncoderFusion :462) with the builder's config
(model_builder.py:116-151): 6 pre-norm layers, d_model 256, ff 2048, relu,
self-attn with positional encodings on q/k, cross-attn to prompt tokens with
no positional encodings, single feature level, no pooled-text add.

TPU-first design: batch-first (B, N, C) everywhere; a single jitted region
covers all 6 layers; the 5184-token self-attention is the model's hot loop
and runs as MXU einsums with fp32 softmax (see models/common.sdpa). DAC
query splitting is expressed with static slices. Activation checkpointing
(`remat`) is applied per layer when training.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import ACT, FusedLayerNorm, MultiheadAttention


class FusionEncoderLayer(nn.Module):
    """Pre/post-norm self-attn + cross-attn + FFN (encoder.py:13)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = True
    pos_enc_at_attn: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    pos_enc_at_cross_attn_keys: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        tgt,  # (B, N, C) image tokens
        memory,  # (B, M, C) prompt tokens
        query_pos=None,  # (B, N, C)
        pos=None,  # (B, M, C) prompt pos
        memory_key_padding_mask=None,  # (B, M) True = pad
        tgt_key_padding_mask=None,  # (B, N) True = pad (self-attn keys)
        *,
        train: bool = False,
    ):
        assert self.pre_norm, "builder uses pre-norm only"
        act = ACT[self.activation]
        do = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.dtype is not None and query_pos is not None:
            # the norms below emit compute dtype (bf16); keep the pos-add in
            # that dtype too or the sum re-promotes to f32 (an extra 5 MB
            # HBM pass per layer). The q/k projections cast to bf16 anyway.
            query_pos = query_pos.astype(self.dtype)

        t2 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        qk = t2 + query_pos if (self.pos_enc_at_attn and query_pos is not None) else t2
        t2 = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(qk, qk, t2, key_padding_mask=tgt_key_padding_mask)
        tgt = tgt + do(t2)

        t2 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
        q = t2 + query_pos if (self.pos_enc_at_cross_attn_queries and query_pos is not None) else t2
        k = memory + pos if (self.pos_enc_at_cross_attn_keys and pos is not None) else memory
        t2 = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="cross_attn_image",
        )(q, k, memory, key_padding_mask=memory_key_padding_mask)
        tgt = tgt + do(t2)

        t2 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        t2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(t2)
        t2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(do(act(t2)))
        return tgt + do(t2)


class FusionEncoder(nn.Module):
    """Stack of FusionEncoderLayers over flattened single-level features.

    Inputs are batch-first flattened image tokens; returns the fused memory
    (B, N, C). The reference's multilevel plumbing (level_start_index,
    valid_ratios) degenerates for num_feature_levels=1, so we keep a single
    (H, W) static shape instead.
    """

    num_layers: int = 6
    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    use_remat: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        src,  # (B, N, C) flattened image tokens
        pos,  # (B, N, C) or (N, C) position embeddings
        prompt,  # (B, M, C)
        prompt_key_padding_mask=None,  # (B, M) True = pad
        *,
        train: bool = False,
    ):
        if pos.ndim == 2:
            pos = jnp.broadcast_to(pos[None], src.shape)
        out = src
        for i in range(self.num_layers):
            layer = FusionEncoderLayer(
                self.d_model, self.dim_feedforward, self.num_heads, self.dropout,
                dtype=self.dtype, name=f"layers_{i}",
            )
            if train and self.use_remat:
                # activation checkpointing per layer; `train` stays a Python
                # constant by closing over it instead of passing through remat
                def call(mdl, o):
                    return mdl(
                        o, prompt, query_pos=pos,
                        memory_key_padding_mask=prompt_key_padding_mask,
                        train=True,
                    )

                out = nn.remat(call)(layer, out)
            else:
                out = layer(
                    out, prompt, query_pos=pos,
                    memory_key_padding_mask=prompt_key_padding_mask, train=train,
                )
        return out
