"""Model builders: the public construction API.

Mirrors the reference surface (sam3/sam3/model_builder.py):
  build_sam3_image_model          (:643)  teacher ViT-H + CLIP text
  build_efficientsam3_image_model (:944)  student trunk (+ LiteText student)
with size naming from the model zoo (README.md:44-76): S/M/L map to
EfficientViT b0/b1/b2, RepViT m0.9/m1.1/m2.3, TinyViT 5m/11m/21m.

Each builder returns (module, init_fn). Parameters come either from
`module.init` (fresh) or from utils/checkpoint.load_reference_checkpoint
(released torch weights converted leaf-by-leaf).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from efficientsam3_tpu.models.efficientvit import (
    EFFICIENTVIT_VARIANTS,
)
from efficientsam3_tpu.models.repvit import REPVIT_VARIANTS
from efficientsam3_tpu.models.sam3_image import Sam3ImageModel
from efficientsam3_tpu.models.student_encoder import ImageStudentEncoder
from efficientsam3_tpu.models.tiny_vit import TINYVIT_VARIANTS

BACKBONE_REGISTRY = {
    "efficientvit": EFFICIENTVIT_VARIANTS,
    "repvit": REPVIT_VARIANTS,
    "tinyvit": TINYVIT_VARIANTS,
}

# model-zoo shorthand (README.md:44-52)
SIZE_ALIASES = {
    ("efficientvit", "s"): "b0", ("efficientvit", "m"): "b1", ("efficientvit", "l"): "b2",
    ("repvit", "s"): "m0.9", ("repvit", "m"): "m1.1", ("repvit", "l"): "m2.3",
    ("tinyvit", "s"): "5m", ("tinyvit", "m"): "11m", ("tinyvit", "l"): "21m",
}


def make_student_trunk(
    backbone_type: str = "efficientvit",
    model_name: str = "b1",
    embed_dim: int = 1024,
    embed_size: int = 72,
    dtype: Optional[jnp.dtype] = None,
):
    """Student trunk + projection head -> (B, embed_size, embed_size, 1024)."""
    model_name = SIZE_ALIASES.get((backbone_type, model_name.lower()), model_name)
    variant_fn = BACKBONE_REGISTRY[backbone_type][model_name]
    return ImageStudentEncoder(
        trunk=variant_fn(dtype=dtype),
        embed_dim=embed_dim,
        embed_size=embed_size,
        dtype=dtype,
    )


def build_efficientsam3_image_model(
    backbone_type: str = "efficientvit",
    model_name: str = "b1",
    text_encoder_type: Optional[str] = None,
    text_encoder_context_length: int = 77,
    enable_inst_interactivity: bool = False,
    embed_size: int = 72,
    dtype: Optional[jnp.dtype] = None,
) -> Sam3ImageModel:
    """EfficientSAM3: student vision trunk, optional LiteText student tower.

    reference model_builder.py:944 build_efficientsam3_image_model.
    """
    trunk = make_student_trunk(
        backbone_type, model_name, embed_size=embed_size, dtype=dtype
    )
    return Sam3ImageModel(
        trunk=trunk,
        text_encoder_type=text_encoder_type,
        text_context_length=text_encoder_context_length,
        add_sam2_neck=enable_inst_interactivity,
        dtype=dtype,
    )


def build_efficientsam3_video_model(
    backbone_type: str = "efficientvit",
    model_name: str = "b1",
    text_encoder_type: Optional[str] = None,
    text_encoder_context_length: int = 77,
    embed_size: int = 72,
    dtype: Optional[jnp.dtype] = None,
):
    """Video PCS: image detector (with SAM2 neck) + tracker core.

    reference model_builder.py:1265 build_efficientsam3_video_model.
    Returns (image_model, tracker_core); wire them with
    video.pipeline.VideoPCSPredictor after init/load.
    """
    from efficientsam3_tpu.video.tracker import TrackerCore

    image_model = build_efficientsam3_image_model(
        backbone_type=backbone_type,
        model_name=model_name,
        text_encoder_type=text_encoder_type,
        text_encoder_context_length=text_encoder_context_length,
        enable_inst_interactivity=True,
        embed_size=embed_size,
        dtype=dtype,
    )
    tracker = TrackerCore(
        image_size=embed_size * 14, backbone_stride=14, dtype=dtype
    )
    return image_model, tracker


def build_sam3_video_model(
    text_encoder_context_length: int = 77, dtype: Optional[jnp.dtype] = None
):
    """Teacher video PCS (reference model_builder.py:1056)."""
    from efficientsam3_tpu.video.tracker import TrackerCore

    image_model = build_sam3_image_model(
        text_encoder_context_length=text_encoder_context_length,
        enable_inst_interactivity=True,
        dtype=dtype,
    )
    tracker = TrackerCore(image_size=1008, backbone_stride=14, dtype=dtype)
    return image_model, tracker


def build_sam3_image_model(
    text_encoder_context_length: int = 77,
    enable_inst_interactivity: bool = False,
    dtype: Optional[jnp.dtype] = None,
) -> Sam3ImageModel:
    """Teacher SAM3: ViT-H trunk + CLIP text tower.

    reference model_builder.py:643 build_sam3_image_model.
    """
    from efficientsam3_tpu.models.vitdet import ViTTrunk

    return Sam3ImageModel(
        trunk=ViTTrunk(dtype=dtype),
        text_encoder_type=None,
        text_context_length=text_encoder_context_length,
        add_sam2_neck=enable_inst_interactivity,
        dtype=dtype,
    )
