"""Geometric prompt container + sequence geometry encoder.

Mirrors reference sam3/sam3/model/geometry_encoders.py (Prompt :82,
SequenceGeometryEncoder :481) with the builder config
(model_builder.py:233-286): boxes/points each encoded by direct coordinate
projection + feature pooling (roi_align / grid_sample) + sine position
encoding, summed with +/- label embeddings; a CLS token is appended; a
post-encode linear+LN; then 3 transformer layers (self-attn over the prompt
sequence + cross-attn to image tokens with sine pos on keys).

TPU-first design: the Prompt is a pytree of FIXED-width padded arrays
(batch-first), so any mix of text/box/point prompting compiles to one
program; "no boxes" is an all-masked row, and the CLS token guarantees a
non-empty sequence (the reference grows tensors dynamically instead). Box
pooling matches the reference's torchvision roi_align exactly, including
adaptive sampling_ratio=-1 (ops/roi_align.py implements the adaptive grid
with static shapes via a capped, weight-masked sample grid).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import sine_encode_boxes, sine_encode_xy
from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy
from efficientsam3_tpu.models.fusion_encoder import FusionEncoderLayer
from efficientsam3_tpu.ops.grid_sample import grid_sample
from efficientsam3_tpu.ops.roi_align import roi_align


@flax.struct.dataclass
class Prompt:
    """Padded geometric prompts, batch-first. Masks: True = PAD (torch
    convention, reference geometry_encoders.py:82)."""

    boxes: jnp.ndarray  # (B, NB, 4) normalized cxcywh
    box_mask: jnp.ndarray  # (B, NB) bool
    box_labels: jnp.ndarray  # (B, NB) int (1 = positive, 0 = negative)
    points: jnp.ndarray  # (B, NP, 2) normalized xy
    point_mask: jnp.ndarray  # (B, NP) bool
    point_labels: jnp.ndarray  # (B, NP) int

    @staticmethod
    def empty(batch: int, num_boxes: int = 8, num_points: int = 8):
        return Prompt(
            boxes=jnp.zeros((batch, num_boxes, 4), jnp.float32),
            box_mask=jnp.ones((batch, num_boxes), bool),
            box_labels=jnp.ones((batch, num_boxes), jnp.int32),
            points=jnp.zeros((batch, num_points, 2), jnp.float32),
            point_mask=jnp.ones((batch, num_points), bool),
            point_labels=jnp.ones((batch, num_points), jnp.int32),
        )

    def with_box(self, batch_idx: int, slot: int, box_cxcywh, label: int = 1):
        return self.replace(
            boxes=self.boxes.at[batch_idx, slot].set(jnp.asarray(box_cxcywh)),
            box_mask=self.box_mask.at[batch_idx, slot].set(False),
            box_labels=self.box_labels.at[batch_idx, slot].set(label),
        )

    def with_point(self, batch_idx: int, slot: int, xy, label: int = 1):
        return self.replace(
            points=self.points.at[batch_idx, slot].set(jnp.asarray(xy)),
            point_mask=self.point_mask.at[batch_idx, slot].set(False),
            point_labels=self.point_labels.at[batch_idx, slot].set(label),
        )


class _TinyDense(nn.Module):
    """Dense with a tiny (2-4) contraction dim, expanded elementwise: such
    matmuls hit low-precision fast paths on both XLA:CPU and the MXU (see
    models/common.PositionEmbeddingRandom). Param layout matches nn.Dense."""

    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        out = jnp.broadcast_to(b, x.shape[:-1] + (self.features,))
        for i in range(x.shape[-1]):
            out = out + x[..., i : i + 1] * k[i]
        return out


class SequenceGeometryEncoder(nn.Module):
    """Prompt -> (B, T, C) tokens + (B, T) pad mask.

    Token order matches the reference: [points, boxes, CLS].
    """

    d_model: int = 256
    num_layers: int = 3
    roi_size: int = 7
    num_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    sampling_ratio: int = -1  # adaptive, torchvision default
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        prompt: Prompt,
        img_tokens,  # (B, HW, C) last-level image tokens
        img_hw,  # static (H, W)
        img_pos=None,  # (B, HW, C) or (HW, C)
        *,
        train: bool = False,
    ):
        d = self.d_model
        b = prompt.points.shape[0]
        h, w = img_hw
        label_embed = nn.Embed(2, d, name="label_embed")
        # pre-norm image features for pooling (geometry_encoders.py:579)
        img_n = nn.LayerNorm(epsilon=1e-5, name="img_pre_norm")(img_tokens)
        img_map = img_n.reshape(b, h, w, d).transpose(0, 3, 1, 2)  # NCHW for pooling

        def tiny_dense(x, feats, name):
            return _TinyDense(feats, name=name)(x)

        # ---- points: direct + grid-sample pool + sine pos ----
        pts = prompt.points.astype(jnp.float32)
        p_embed = tiny_dense(pts, d, "points_direct_project")
        grid = (pts * 2.0 - 1.0)[:, :, None, :]  # (B, NP, 1, 2)
        sampled = grid_sample(img_map, grid)[:, :, :, 0].transpose(0, 2, 1)  # (B,NP,C)
        p_embed = p_embed + nn.Dense(d, dtype=self.dtype, name="points_pool_project")(
            sampled
        )
        ex, ey = sine_encode_xy(pts[..., 0], pts[..., 1], d)
        p_embed = p_embed + nn.Dense(
            d, dtype=self.dtype, name="points_pos_enc_project"
        )(jnp.concatenate([ex, ey], axis=-1))
        p_embed = p_embed + label_embed(prompt.point_labels)

        # ---- boxes: direct + roi-align pool + sine pos ----
        boxes = prompt.boxes.astype(jnp.float32)
        nb = boxes.shape[1]
        b_embed = tiny_dense(boxes, d, "boxes_direct_project")
        boxes_xyxy = box_cxcywh_to_xyxy(boxes) * jnp.asarray(
            [w, h, w, h], jnp.float32
        )
        flat_boxes = boxes_xyxy.reshape(b * nb, 4)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nb)
        pooled = roi_align(
            img_map, flat_boxes, bidx, (self.roi_size, self.roi_size),
            spatial_scale=1.0, sampling_ratio=self.sampling_ratio, aligned=False,
        )  # (B*NB, C, 7, 7)
        # boxes_pool_project is a VALID 7x7 conv == linear over the ROI map
        pooled = pooled.transpose(0, 2, 3, 1)  # NHWC
        proj = nn.Conv(
            d, (self.roi_size, self.roi_size), padding="VALID", dtype=self.dtype,
            name="boxes_pool_project",
        )(pooled)  # (B*NB, 1, 1, C)
        b_embed = b_embed + proj.reshape(b, nb, d)
        enc = sine_encode_boxes(
            boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3], d
        )
        b_embed = b_embed + nn.Dense(
            d, dtype=self.dtype, name="boxes_pos_enc_project"
        )(enc)
        b_embed = b_embed + label_embed(prompt.box_labels)

        # ---- concat [points, boxes, CLS] ----
        cls = nn.Embed(1, d, name="cls_embed").embedding
        tokens = jnp.concatenate(
            [p_embed, b_embed, jnp.broadcast_to(cls[None], (b, 1, d))], axis=1
        )
        mask = jnp.concatenate(
            [prompt.point_mask, prompt.box_mask, jnp.zeros((b, 1), bool)], axis=1
        )

        tokens = nn.LayerNorm(epsilon=1e-5, name="norm")(
            nn.Dense(d, dtype=self.dtype, name="final_proj")(tokens)
        )

        # ---- transformer: self-attn over prompt + cross-attn to image ----
        if img_pos is not None and img_pos.ndim == 2:
            img_pos = jnp.broadcast_to(img_pos[None], img_tokens.shape)
        for i in range(self.num_layers):
            tokens = FusionEncoderLayer(
                d, self.dim_feedforward, self.num_heads, self.dropout,
                pos_enc_at_attn=False,
                pos_enc_at_cross_attn_keys=True,
                pos_enc_at_cross_attn_queries=False,
                dtype=self.dtype,
                name=f"encode_{i}",
            )(
                tokens, img_tokens, query_pos=None, pos=img_pos,
                tgt_key_padding_mask=mask, train=train,
            )
        tokens = nn.LayerNorm(epsilon=1e-5, name="encode_norm")(tokens)
        return tokens, mask
