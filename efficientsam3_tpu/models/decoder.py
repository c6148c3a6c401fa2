"""DETR-style transformer decoder with box refinement, boxRPB attention
bias, DAC (duplicated o2o/o2m queries) and a presence token.

Mirrors reference sam3/sam3/model/decoder.py (TransformerDecoderLayer :33,
TransformerDecoder :192) with the builder config (model_builder.py:154-188):
6 layers, 200 queries, d_model 256, ff 2048, 8 heads, text cross-attention,
box refinement, boxRPB="log", DAC, presence token.

TPU-first notes:
  - All shapes static: queries are tiled 2x for DAC with static slicing; the
    presence token is carried as a separate (B, 1, C) tensor instead of
    concat/split where possible.
  - The boxRPB bias is computed as two tiny MLPs over (B, Q, H|W, 2) then an
    outer sum -> (B, heads, Q, HW) additive attention bias; everything fuses
    under jit, replacing the reference's device-side coordinate caches.
  - Box refinement uses stop_gradient on the reference boxes between layers
    (reference .detach(), decoder.py:578).

Note: the reference's presence-logit clamp is a no-op (`Tensor.clamp`
without assignment, decoder.py:595-599); we intentionally do not clamp to
match actual behavior.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import ACT, MLP, MultiheadAttention


def inverse_sigmoid(x, eps: float = 1e-3):
    """reference model_misc.py:20."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def gen_sineembed_for_position(pos, num_feats: int = 256):
    """(..., 2|4) normalized coords -> (..., num_feats * ncoords / ... ).

    Matches reference model_misc.py:238 (order: y, x, w, h; 128 feats each
    for num_feats=256).
    """
    half = num_feats // 2
    scale = 2 * math.pi
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / half)

    def enc(v):
        p = (v * scale)[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1).reshape(
            *v.shape, half
        )

    pos_x = enc(pos[..., 0])
    pos_y = enc(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    pos_w = enc(pos[..., 2])
    pos_h = enc(pos[..., 3])
    return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)


class DecoderLayer(nn.Module):
    """Self-attn (o2o + presence only) -> text cross-attn -> image
    cross-attn with boxRPB bias -> FFN. reference decoder.py:33."""

    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    activation: str = "relu"
    use_text_cross_attention: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        tgt,  # (B, NQ, C); with DAC NQ = 2*Q
        query_pos,  # (B, NQ, C)
        memory,  # (B, HW, C) image memory
        memory_pos,  # (B, HW, C) or None
        rpb,  # decomposed boxRPB bias (ey, ex, (h, w)) or None
        memory_text=None,  # (B, T, C)
        text_key_padding_mask=None,  # (B, T) True = pad
        presence_token=None,  # (B, 1, C) or None
        dac: bool = False,
        *,
        train: bool = False,
    ):
        act = ACT[self.activation]
        do = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        nq = tgt.shape[1]

        # ---- self attention over o2o queries (+ presence token) ----
        if dac:
            q_half = nq // 2
            tgt_o2o = tgt[:, :q_half]
            pos_o2o = query_pos[:, :q_half]
            tgt_o2m = tgt[:, q_half:]
        else:
            tgt_o2o, pos_o2o, tgt_o2m = tgt, query_pos, None
        if presence_token is not None:
            tgt_o2o = jnp.concatenate([presence_token, tgt_o2o], axis=1)
            pos_o2o = jnp.concatenate([jnp.zeros_like(presence_token), pos_o2o], axis=1)
            query_pos_full = jnp.concatenate(
                [jnp.zeros_like(presence_token), query_pos], axis=1
            )
        else:
            query_pos_full = query_pos
        qk = tgt_o2o + pos_o2o
        sa = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(qk, qk, tgt_o2o)
        tgt_o2o = tgt_o2o + do(sa)
        if dac:
            tgt = jnp.concatenate([tgt_o2o, tgt_o2m], axis=1)  # (B, 1+NQ, C)
        else:
            tgt = tgt_o2o
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)

        # ---- text cross attention ----
        if self.use_text_cross_attention and memory_text is not None:
            t2 = MultiheadAttention(
                self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
                name="ca_text",
            )(
                tgt + query_pos_full,
                memory_text,
                memory_text,
                key_padding_mask=text_key_padding_mask,
            )
            tgt = tgt + do(t2)
            tgt = nn.LayerNorm(epsilon=1e-5, name="catext_norm")(tgt)

        # ---- image cross attention (boxRPB additive bias) ----
        k = memory + memory_pos if memory_pos is not None else memory
        t2 = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="cross_attn",
        )(tgt + query_pos_full, k, memory, rpb=rpb, rpb_kernel=not train)
        tgt = tgt + do(t2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)

        # ---- FFN (fp32, reference disables autocast here) ----
        t2 = tgt.astype(jnp.float32)
        t2 = nn.Dense(self.dim_feedforward, name="linear1")(t2)
        t2 = nn.Dense(self.d_model, name="linear2")(do(act(t2)))
        tgt = tgt + do(t2.astype(tgt.dtype))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)

        if presence_token is not None:
            return tgt[:, 1:], tgt[:, :1]
        return tgt, None


class TransformerDecoder(nn.Module):
    """reference decoder.py:192 with builder config."""

    num_layers: int = 6
    num_queries: int = 200
    d_model: int = 256
    dim_feedforward: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    dac: bool = True
    box_rpb: str = "log"
    presence_token: bool = True
    use_remat: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = self.d_model
        self.query_embed = nn.Embed(
            self.num_queries, d,
            embedding_init=nn.initializers.normal(1.0),
        )
        self.reference_points = nn.Embed(self.num_queries, 4)
        self.norm = nn.LayerNorm(epsilon=1e-5)
        self.bbox_embed = MLP(d, 4, 3, name="bbox_embed")
        self.ref_point_head = MLP(d, d, 2, name="ref_point_head")
        nheads = self.num_heads
        if self.box_rpb != "none":
            n_in = 4 if self.box_rpb == "both" else 2
            self.boxRPB_embed_x = MLP(d, nheads, 2, name="boxRPB_embed_x")
            self.boxRPB_embed_y = MLP(d, nheads, 2, name="boxRPB_embed_y")
        if self.presence_token:
            self.presence_token_embed = nn.Embed(1, d, name="presence_token_embed")
            self.presence_token_head = MLP(d, 1, 3, name="presence_token_head")
            self.presence_token_out_norm = nn.LayerNorm(
                epsilon=1e-5, name="presence_token_out_norm"
            )
        self.layers = [
            DecoderLayer(
                self.d_model, self.dim_feedforward, self.num_heads, self.dropout,
                dtype=self.dtype, name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]

    def _rpb_decomposed(self, reference_boxes, feat_hw):
        """(B, NQ, 4) cxcywh in [0,1] -> (ey (B, nh, NQ, H), ex (B, nh, NQ, W)).

        reference decoder.py:333 _get_rpb_matrix, boxRPB='log'. The full
        (B, nh, NQ, H*W) bias is the outer sum ey[..., y] + ex[..., x]; it
        is never materialized here — the attention either reconstitutes
        tiles in VMEM (flash_xattn_rpb) or builds it right before the
        einsum. Only the small (B, NQ, H|W, nh) -> heads-first transposes
        happen in HBM (a few MB, vs ~532 MB/layer for the batch-8 bias).
        """
        h, w = feat_hw
        boxes = box_cxcywh_to_xyxy(reference_boxes)  # (B, NQ, 4)
        coords_h = jnp.arange(h, dtype=jnp.float32) / h
        coords_w = jnp.arange(w, dtype=jnp.float32) / w
        dy = coords_h[None, None, :, None] - boxes[:, :, None, 1:4:2]  # (B,NQ,H,2)
        dx = coords_w[None, None, :, None] - boxes[:, :, None, 0:3:2]  # (B,NQ,W,2)

        def logmap(v):
            v = v * 8.0
            return jnp.sign(v) * jnp.log2(jnp.abs(v) + 1.0) / math.log2(8.0)

        if self.box_rpb == "log":
            dx, dy = logmap(dx), logmap(dy)
        elif self.box_rpb == "both":
            dx = jnp.concatenate([dx, logmap(dx)], axis=-1)
            dy = jnp.concatenate([dy, logmap(dy)], axis=-1)
        ex = self.boxRPB_embed_x(dx)  # (B, NQ, W, heads)
        ey = self.boxRPB_embed_y(dy)  # (B, NQ, H, heads)
        return ey.transpose(0, 3, 1, 2), ex.transpose(0, 3, 1, 2)

    def __call__(
        self,
        memory,  # (B, HW, C) fused image memory
        feat_hw,  # static (H, W)
        memory_pos=None,  # (B, HW, C)
        memory_text=None,  # (B, T, C)
        text_key_padding_mask=None,  # (B, T)
        apply_dac: Optional[bool] = None,
        tgt=None,  # optional (B, NQ, C) initial queries (defaults to learned)
        reference_boxes=None,  # optional (B, NQ, 4) sigmoided
        *,
        train: bool = False,
    ):
        b = memory.shape[0]
        dac = self.dac if apply_dac is None else apply_dac
        if tgt is None:
            tgt = jnp.broadcast_to(
                self.query_embed.embedding[None], (b, self.num_queries, self.d_model)
            )
        if dac:
            tgt = jnp.concatenate([tgt, tgt], axis=1)
        nq = tgt.shape[1]
        if reference_boxes is None:
            ref = jax.nn.sigmoid(self.reference_points.embedding)  # (Q, 4)
            ref = jnp.broadcast_to(ref[None], (b, self.num_queries, 4))
            if dac:
                ref = jnp.concatenate([ref, ref], axis=1)
        else:
            ref = reference_boxes
            if dac and ref.shape[1] == self.num_queries:
                ref = jnp.concatenate([ref, ref], axis=1)

        presence = None
        if self.presence_token:
            presence = jnp.broadcast_to(
                self.presence_token_embed.embedding[None], (b, 1, self.d_model)
            )

        inter_hs = []
        inter_refs = [ref]
        inter_presence = []
        output = tgt
        for li, layer in enumerate(self.layers):
            sine = gen_sineembed_for_position(ref, self.d_model)  # (B,NQ,2C)
            query_pos = self.ref_point_head(sine)
            rpb = None
            if self.box_rpb != "none":
                ey, ex = self._rpb_decomposed(ref, feat_hw)  # (B,nh,NQ,H|W)
                if presence is not None:
                    # presence token (query row 0) attends with zero bias
                    ey = jnp.concatenate([jnp.zeros_like(ey[:, :, :1]), ey], axis=2)
                    ex = jnp.concatenate([jnp.zeros_like(ex[:, :, :1]), ex], axis=2)
                rpb = (ey, ex, feat_hw)
            output, presence = layer(
                output, query_pos, memory, memory_pos, rpb,
                memory_text=memory_text,
                text_key_padding_mask=text_key_padding_mask,
                presence_token=presence,
                dac=dac,
                train=train,
            )
            normed = self.norm(output)
            delta = self.bbox_embed(normed)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            ref = jax.lax.stop_gradient(new_ref)
            if li != self.num_layers - 1:
                inter_refs.append(new_ref)
            inter_hs.append(normed)
            if self.presence_token:
                logits = self.presence_token_head(
                    self.presence_token_out_norm(presence)
                )[..., 0, 0]  # (B,)
                inter_presence.append(logits)

        return {
            "hs": jnp.stack(inter_hs),  # (L, B, NQ, C)
            "references": jnp.stack(inter_refs),  # (L, B, NQ, 4)
            "presence_logits": (
                jnp.stack(inter_presence) if self.presence_token else None
            ),  # (L, B)
            "presence_feats": presence,  # (B, 1, C)
        }


class DotProductScoring(nn.Module):
    """Query-to-pooled-prompt dot-product logits (model_misc.py:37).

    hs: (L, B, NQ, C); prompt: (B, T, C); prompt_mask: (B, T) True = pad.
    Returns (L, B, NQ, 1).
    """

    d_model: int = 256
    d_proj: int = 256
    clamp_max_val: float = 12.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, hs, prompt, prompt_mask, *, train: bool = False):
        prompt = MLP(
            2048, self.d_model, 2, dropout=0.1, residual=True, out_norm=True,
            name="prompt_mlp",
        )(prompt, train=train)
        valid = (~prompt_mask).astype(jnp.float32)[..., None]  # (B,T,1)
        num_valid = jnp.maximum(valid.sum(axis=1), 1.0)  # (B,1)
        pooled = (prompt * valid).sum(axis=1) / num_valid  # (B,C)
        proj_prompt = nn.Dense(self.d_proj, dtype=self.dtype, name="prompt_proj")(pooled)
        proj_hs = nn.Dense(self.d_proj, dtype=self.dtype, name="hs_proj")(hs)
        scores = jnp.einsum(
            "lbqd,bd->lbq", proj_hs, proj_prompt, preferred_element_type=jnp.float32
        ) / math.sqrt(self.d_proj)
        scores = jnp.clip(scores, -self.clamp_max_val, self.clamp_max_val)
        return scores[..., None].astype(hs.dtype)
