"""Tracker memory attention: image tokens cross-attend the memory bank.

Mirrors the reference's TransformerEncoderCrossAttention with
TransformerDecoderLayerv2 layers (sam3/sam3/model/decoder.py:621,893) and
the builder config (model_builder.py:367-429): 4 pre-norm layers, d_model
256, single-head RoPE self-attention over the 72x72 image tokens and RoPE
cross-attention (kv_in_dim 64, rope_k_repeat) to the concatenated
[spatial memories ; object-pointer tokens] bank, 0.1x positional encoding
added at input, final LayerNorm.

TPU-first: the memory bank is a FIXED-width padded array (invalid slots
masked in attention) so every frame step compiles once — replacing the
reference's per-frame dynamic concat of dict-of-frames memories.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import ACT, RoPEAttention


class MemoryAttentionLayer(nn.Module):
    """self RoPE-attn -> cross RoPE-attn to memory -> FFN (decoder.py:893)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 1
    kv_in_dim: int = 64
    dropout: float = 0.1
    activation: str = "relu"
    pos_enc_at_cross_attn_keys: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        tgt,  # (B, HW, C) image tokens
        memory,  # (B, S, kv_in_dim) memory bank tokens
        memory_pos,  # (B, S, kv_in_dim)
        memory_mask=None,  # (B, S) True = invalid slot
        num_obj_ptr_tokens: int = 0,
        self_key_padding_mask=None,  # (B, HW) True = skip (empty obj slot)
        *,
        train: bool = False,
    ):
        do = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        act = ACT[self.activation]

        t2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        t2 = RoPEAttention(
            self.d_model, self.num_heads, dtype=self.dtype, name="self_attn"
        )(t2, t2, t2, key_padding_mask=self_key_padding_mask)
        tgt = tgt + do(t2)

        t2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        k = memory + memory_pos if self.pos_enc_at_cross_attn_keys else memory
        t2 = RoPEAttention(
            self.d_model, self.num_heads, kv_in_dim=self.kv_in_dim,
            rope_k_repeat=True, dtype=self.dtype, name="cross_attn_image",
        )(
            t2, k, memory,
            num_k_exclude_rope=num_obj_ptr_tokens,
            key_padding_mask=memory_mask,
        )
        tgt = tgt + do(t2)

        t2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        t2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(t2)
        t2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(do(act(t2)))
        return tgt + do(t2)


class MemoryAttention(nn.Module):
    """4-layer memory-attention encoder (decoder.py:621)."""

    num_layers: int = 4
    d_model: int = 256
    kv_in_dim: int = 64
    dim_feedforward: int = 2048
    pos_enc_at_input: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        src,  # (B, HW, C) image tokens
        src_pos,  # (B, HW, C) or (HW, C)
        memory,  # (B, S, kv)
        memory_pos,  # (B, S, kv)
        memory_mask=None,  # (B, S) True = invalid
        num_obj_ptr_tokens: int = 0,
        *,
        train: bool = False,
    ):
        if src_pos is not None and src_pos.ndim == 2:
            src_pos = jnp.broadcast_to(src_pos[None], src.shape)
        out = src
        if self.pos_enc_at_input and src_pos is not None:
            out = out + 0.1 * src_pos
        # object slots with NO valid memory tokens at all are empty padding
        # (the predictor gates their outputs by slot_valid); masking their
        # self-attention keys lets the flash kernel skip those slots' 5184^2
        # blocks entirely, so per-frame compute scales with ACTIVE objects
        # while shapes stay static (the reference reshapes dynamically).
        self_kpm = None
        if memory_mask is not None:
            slot_empty = jnp.all(memory_mask, axis=-1)  # (B,)
            self_kpm = jnp.broadcast_to(
                slot_empty[:, None], (src.shape[0], src.shape[1])
            )
        for i in range(self.num_layers):
            out = MemoryAttentionLayer(
                self.d_model, self.dim_feedforward, kv_in_dim=self.kv_in_dim,
                dtype=self.dtype, name=f"layers_{i}",
            )(
                out, memory, memory_pos, memory_mask,
                num_obj_ptr_tokens=num_obj_ptr_tokens,
                self_key_padding_mask=self_kpm, train=train,
            )
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out)
