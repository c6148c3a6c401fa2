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

Cached-bank fast path: the bank mutates by at most one entry per frame, so
per-layer key projections + rotary encoding of the ~36k memory tokens
(measured 3.0 ms/layer of the 15.2 ms cross-attention at 8 slots) are
recomputed needlessly every frame in the plain path. `project_bank_entry`
computes a single entry's per-layer keys once at encode-memory time;
`forward_cached` consumes the assembled per-layer bank keys and only
projects the (tiny, per-frame) object-pointer tokens and queries. The
slot-age temporal embedding (maskmem_tpos_enc) is linear through k_proj,
so aging an entry is an additive rope'd delta applied at attention time
(video/tracker.py tpos_k_delta) rather than a reprojection.

Values are never projected per key at all on this path: v = v_proj(x) is
linear and softmax rows sum to 1, so A @ v_proj(x) == v_proj(A @ x) —
attention runs over the RAW mem_dim(64)-wide tokens (4x fewer AV FLOPs,
ops/pallas/flash_attention.py flash_memattn runs it transposed to keep
all MXU lanes live) and the 64->256 up-projection applies once per query
after the weighted sum. The value side of the cache is therefore just
the memory tokens themselves, layer-independent.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import ACT, FusedLayerNorm, RoPEAttention


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

    def setup(self):
        # fused Pallas norms emit compute dtype directly: every consumer
        # (RoPEAttention q/k/v Dense, FFN Dense) casts to it anyway
        self.norm1 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.self_attn = RoPEAttention(
            self.d_model, self.num_heads, dtype=self.dtype
        )
        self.cross_attn_image = RoPEAttention(
            self.d_model, self.num_heads, kv_in_dim=self.kv_in_dim,
            rope_k_repeat=True, dtype=self.dtype,
        )
        self.linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _cross_inputs(self, memory, memory_pos):
        k = memory + memory_pos if self.pos_enc_at_cross_attn_keys else memory
        return k, memory

    def project_entry_k(self, entry, entry_pos, grid_tokens: int):
        """Per-layer cached keys of one memory-bank entry (B, S, kv_in_dim).

        entry_pos carries the spatial sine embedding only — the slot-age
        temporal embedding is added later as a rope'd linear delta. Values
        are NOT cached: the cached path attends over the raw kv_in_dim
        tokens and up-projects after the attention (attend_projected_rawv),
        so the value cache would be pure waste."""
        k_in, _ = self._cross_inputs(entry, entry_pos)
        kh, _ = self.cross_attn_image.project_kv(k_in, entry, grid_tokens)
        return kh

    def _tail(self, tgt, train: bool):
        do = lambda x: self.drop(x, deterministic=not train)
        act = ACT[self.activation]
        t2 = self.norm3(tgt)
        t2 = self.linear1(t2)
        t2 = self.linear2(do(act(t2)))
        return tgt + do(t2)

    def _self_block(self, tgt, self_key_padding_mask, train: bool):
        do = lambda x: self.drop(x, deterministic=not train)
        t2 = self.norm1(tgt)
        t2 = self.self_attn(t2, t2, t2, key_padding_mask=self_key_padding_mask)
        return tgt + do(t2)

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
        do = lambda x: self.drop(x, deterministic=not train)
        tgt = self._self_block(tgt, self_key_padding_mask, train)

        t2 = self.norm2(tgt)
        k, v = self._cross_inputs(memory, memory_pos)
        t2 = self.cross_attn_image(
            t2, k, v,
            num_k_exclude_rope=num_obj_ptr_tokens,
            key_padding_mask=memory_mask,
        )
        tgt = tgt + do(t2)
        return self._tail(tgt, train)

    def forward_cached(
        self,
        tgt,  # (B, HW, C)
        kh_mem,  # (B, heads, S_mem, internal) cached rope'd bank keys
        v_mem,  # (B, heads, S_mem, kv_in_dim) RAW bank tokens (layer-shared)
        mem_mask,  # (B, S_mem) True = invalid
        kh_ptr,  # (B, heads, S_ptr, internal) per-frame pointer keys
        v_ptr,  # (B, heads, S_ptr, kv_in_dim) raw pointer tokens
        ptr_mask,  # (B, S_ptr)
        self_key_padding_mask=None,
        *,
        train: bool = False,
    ):
        do = lambda x: self.drop(x, deterministic=not train)
        tgt = self._self_block(tgt, self_key_padding_mask, train)
        t2 = self.cross_attn_image.attend_projected_rawv_2seg(
            self.norm2(tgt), kh_mem, v_mem, mem_mask, kh_ptr, v_ptr, ptr_mask
        )
        tgt = tgt + do(t2)
        return self._tail(tgt, train)


class MemoryAttention(nn.Module):
    """4-layer memory-attention encoder (decoder.py:621)."""

    num_layers: int = 4
    d_model: int = 256
    kv_in_dim: int = 64
    dim_feedforward: int = 2048
    pos_enc_at_input: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.layers = [
            MemoryAttentionLayer(
                self.d_model, self.dim_feedforward, kv_in_dim=self.kv_in_dim,
                dtype=self.dtype, name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = FusedLayerNorm(epsilon=1e-5)

    def _prep(self, src, src_pos, memory_mask):
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
        return out, self_kpm

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
        out, self_kpm = self._prep(src, src_pos, memory_mask)
        for layer in self.layers:
            out = layer(
                out, memory, memory_pos, memory_mask,
                num_obj_ptr_tokens=num_obj_ptr_tokens,
                self_key_padding_mask=self_kpm, train=train,
            )
        return self.norm(out)

    def project_bank_entry(self, entry, entry_pos, grid_tokens: int):
        """All layers' cached keys for one bank entry.

        entry (B, S, kv_in_dim), entry_pos (S, kv_in_dim) or broadcastable.
        Returns k (B, L, heads, S, internal). Values are not cached (raw
        tokens are attended directly; see attend_projected_rawv)."""
        if entry_pos.ndim == 2:
            entry_pos = entry_pos[None]
        ks = [
            layer.project_entry_k(entry, entry_pos, grid_tokens)
            for layer in self.layers
        ]
        # LAYER-LEADING stack: the persistent bank keeps L outermost so the
        # per-frame per-layer slice k_bank[li] is a contiguous view instead
        # of a 148 MB relayout copy (profiled 1.8 ms/frame r5)
        return jnp.stack(ks, axis=0)

    def forward_cached(
        self,
        src,  # (B, HW, C)
        src_pos,
        k_mem_layers,  # L-list of (B, heads, S_mem, internal) bank keys
        v_mem,  # (B, heads, S_mem, kv_in_dim) raw bank tokens (layer-shared)
        mem_mask,  # (B, S_mem)
        k_ptr_layers,  # L-list of (B, heads, S_ptr, internal) pointer keys
        v_ptr,  # (B, heads, S_ptr, kv_in_dim)
        ptr_mask,  # (B, S_ptr)
        *,
        train: bool = False,
    ):
        full_mask = jnp.concatenate([mem_mask, ptr_mask], axis=1)
        out, self_kpm = self._prep(src, src_pos, full_mask)
        for i, layer in enumerate(self.layers):
            out = layer.forward_cached(
                out, k_mem_layers[i], v_mem, mem_mask,
                k_ptr_layers[i], v_ptr, ptr_mask,
                self_key_padding_mask=self_kpm, train=train,
            )
        return self.norm(out)
