"""SAM3/EfficientSAM3 image PCS model: backbone -> fusion -> decoder -> heads.

Mirrors the reference composition (sam3/sam3/model/sam3_image.py:36 Sam3Image,
sam3/sam3/model/vl_combiner.py:17 SAM3VLBackbone) with the builder wiring
(model_builder.py:643-1055): a vision trunk (student encoder or ViT-H
teacher) -> dual SimpleFPN neck (scalp=1 drops the 0.5x level) -> fusion
encoder over the 72x72 token level with the concatenated
[text; geometry; (visual)] prompt -> DETR decoder (200 queries, boxRPB,
presence token, DAC at train) -> segmentation head + dot-product scoring.

TPU-first design:
  - Three jittable entry methods with static shapes: `encode_image`,
    `encode_text`, `ground`. The host-side Processor (processor.py) jits and
    caches each; prompts are fixed-width padded (models/geometry.Prompt).
  - No id_mapping / frame caches in the graph: video-time feature caching is
    host-level (the video pipeline dispatches per-frame encodes).
  - Everything downstream of the trunk is shared verbatim between teacher
    and student variants, mirroring the reference's drop-in design.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.decoder import DotProductScoring, TransformerDecoder
from efficientsam3_tpu.models.fusion_encoder import FusionEncoder
from efficientsam3_tpu.models.geometry import Prompt, SequenceGeometryEncoder
from efficientsam3_tpu.models.mobile_clip import TextStudentEncoder
from efficientsam3_tpu.models.necks import DualFPNNeck
from efficientsam3_tpu.models.seg_head import UniversalSegmentationHead
from efficientsam3_tpu.models.text_encoder import VETextEncoder


class Sam3ImageModel(nn.Module):
    """Full PCS detector. Construct via efficientsam3_tpu.build.* helpers."""

    trunk: nn.Module  # images (B, H, W, 3) -> (B, 72, 72, 1024)
    text_encoder_type: Optional[str] = None  # None = teacher CLIP tower
    text_context_length: int = 77
    d_model: int = 256
    num_queries: int = 200
    add_sam2_neck: bool = False
    fusion_layers: int = 6  # override for tiny test/dryrun configs
    decoder_layers: int = 6
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.neck = DualFPNNeck(
            d_model=self.d_model,
            add_sam2_neck=self.add_sam2_neck,
            dtype=self.dtype,
            name="neck",
        )
        if self.text_encoder_type is None:
            self.text_encoder = VETextEncoder(
                d_model=self.d_model,
                context_length=self.text_context_length,
                dtype=self.dtype,
                name="text_encoder",
            )
        else:
            self.text_encoder = TextStudentEncoder(
                backbone_type=self.text_encoder_type,
                context_length=self.text_context_length,
                output_dim=self.d_model,
                dtype=self.dtype,
                name="text_encoder",
            )
        self.geometry_encoder = SequenceGeometryEncoder(
            d_model=self.d_model, dtype=self.dtype, name="geometry_encoder"
        )
        self.fusion_encoder = FusionEncoder(
            num_layers=self.fusion_layers, d_model=self.d_model,
            dtype=self.dtype, name="fusion_encoder",
        )
        self.decoder = TransformerDecoder(
            num_layers=self.decoder_layers, num_queries=self.num_queries,
            d_model=self.d_model, dtype=self.dtype, name="decoder",
        )
        self.seg_head = UniversalSegmentationHead(
            hidden_dim=self.d_model, dtype=self.dtype, name="seg_head"
        )
        self.scoring = DotProductScoring(
            d_model=self.d_model, dtype=self.dtype, name="scoring"
        )

    # ------------------------------------------------------------------
    # jittable stages
    # ------------------------------------------------------------------

    def encode_image(self, images, *, train: bool = False):
        """images: (B, H, W, 3) normalized. Returns FPN levels + pos.

        After scalp=1 (vl_combiner.py:94-104) levels are
        [288 (4x), 144 (2x), 72 (1x)] at d_model channels, NHWC.
        """
        embed = self.trunk(images, train=train)
        sam3_feats, sam3_pos, sam2_feats, sam2_pos = self.neck(embed)
        # scalp=1: drop the lowest-resolution (0.5x) level
        out = {
            "fpn": sam3_feats[:-1],
            "pos": sam3_pos[:-1],
        }
        if sam2_feats is not None:
            out["sam2_fpn"] = sam2_feats
            out["sam2_pos"] = sam2_pos
        return out

    def encode_text(self, tokens, *, train: bool = False):
        """tokens: (B, L) int32 -> (text_memory (B, L, C), pad_mask (B, L))."""
        return self.text_encoder(tokens, train=train)

    def ground(
        self,
        fpn,  # list of NHWC levels [288, 144, 72]
        pos,  # list of (H, W, C) sine embeddings
        text_memory,  # (B, L, C)
        text_mask,  # (B, L) True = pad
        prompt: Prompt,
        *,
        train: bool = False,
        stage: Optional[str] = None,
    ):
        """Text+geometry grounding -> detection outputs (static shapes).

        stage: early-return point for per-stage profiling (bench.py):
        'fusion' stops after the fusion encoder, 'decoder' after the
        decoder+scoring/boxes; unused stages dead-code-eliminate out of
        the jitted program."""
        b = fpn[-1].shape[0]
        h, w = fpn[-1].shape[1:3]
        img_tokens = fpn[-1].reshape(b, h * w, self.d_model)
        img_pos = pos[-1].reshape(h * w, self.d_model)

        # geometry prompt tokens; concat [text; geo] (sam3_image.py:169-211)
        geo_tokens, geo_mask = self.geometry_encoder(
            prompt, img_tokens, (h, w), img_pos, train=train
        )
        full_prompt = jnp.concatenate([text_memory, geo_tokens], axis=1)
        full_mask = jnp.concatenate([text_mask, geo_mask], axis=1)

        # fusion encoder (hot loop 1)
        memory = self.fusion_encoder(
            img_tokens, img_pos, full_prompt, full_mask, train=train
        )

        if stage == "fusion":
            return {"encoder_hidden_states": memory}

        # decoder (hot loop 2)
        dec = self.decoder(
            memory,
            (h, w),
            memory_pos=jnp.broadcast_to(img_pos[None], memory.shape),
            memory_text=full_prompt,
            text_key_padding_mask=full_mask,
            apply_dac=train,
            train=train,
        )
        hs = dec["hs"]  # (L, B, NQ, C)
        refs = dec["references"]

        # scores + boxes (sam3_image.py:302-386)
        logits = self.scoring(hs, full_prompt, full_mask, train=train)  # (L,B,NQ,1)
        from efficientsam3_tpu.models.decoder import box_cxcywh_to_xyxy, inverse_sigmoid

        delta = self.decoder.bbox_embed(hs)
        boxes = jax.nn.sigmoid(delta + inverse_sigmoid(refs))

        if stage == "decoder":
            return {
                "pred_logits": logits[-1],
                "pred_boxes": boxes[-1],
                "encoder_hidden_states": memory,
            }

        # segmentation head on last-layer queries
        seg = self.seg_head(
            fpn, hs[-1], memory, full_prompt, full_mask, train=train,
            stage=stage,
        )
        if stage in ("segxattn", "pixdec"):
            return {
                "pred_logits": logits[-1],
                "pred_boxes": boxes[-1],
                "pred_masks": seg["pred_masks"],
                "encoder_hidden_states": memory,
            }

        nq = self.num_queries
        out = {
            "pred_logits": logits[-1][:, :nq],
            "pred_boxes": boxes[-1][:, :nq],
            "pred_boxes_xyxy": box_cxcywh_to_xyxy(boxes[-1][:, :nq]),
            "pred_masks": seg["pred_masks"][:, :nq],
            "semantic_seg": seg["semantic_seg"],
            "presence_logit_dec": (
                dec["presence_logits"][-1] if dec["presence_logits"] is not None else None
            ),
            "queries": hs[-1][:, :nq],
            "encoder_hidden_states": memory,
        }
        if train:
            out["aux"] = {
                "pred_logits": logits[:-1],
                "pred_boxes": boxes[:-1],
                "presence_logits": (
                    dec["presence_logits"][:-1]
                    if dec["presence_logits"] is not None
                    else None
                ),
            }
            out["pred_logits_o2m"] = logits[-1][:, nq:]
            out["pred_boxes_o2m"] = boxes[-1][:, nq:]
            out["pred_masks_o2m"] = seg["pred_masks"][:, nq:]
            out["all_presence_logits"] = dec["presence_logits"]
        return out

    def __call__(self, images, tokens, prompt: Prompt, *, train: bool = False,
                 stage: Optional[str] = None):
        """Full forward: encode image + text, then ground."""
        img_out = self.encode_image(images, train=train)
        text_memory, text_mask = self.encode_text(tokens, train=train)
        return self.ground(
            img_out["fpn"], img_out["pos"], text_memory, text_mask, prompt,
            train=train, stage=stage,
        )
