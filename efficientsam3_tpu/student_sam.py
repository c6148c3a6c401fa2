"""Standalone SAM1-style student models (the EdgeSAM lineage).

Mirrors reference sam3/sam3/model/student_sam/build_sam.py:24-182: builders
for SAM1 models whose image encoder is a distilled student trunk
(RepViT / TinyViT / EfficientViT) or a ViT, with the original SAM prompt
encoder + mask decoder (no object-score head, no high-res skip features -
the SAM1 configuration), at image_size 1024 / 64x64 embeddings.

TPU-first: the model is one flax module with two jittable methods
(`encode_image`, `predict_masks`), NHWC throughout; the interactive
predictor facade matches student_sam/predictor.py SamPredictor.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.sam import MaskDecoder, PromptEncoder


class SamStudentModel(nn.Module):
    """SAM1 student: trunk -> 256ch 64x64 embeddings -> SAM heads."""

    trunk: nn.Module
    image_size: int = 1024
    embed_size: int = 64
    d_model: int = 256
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.neck = nn.Sequential(
            [
                nn.Conv(self.d_model, (1, 1), use_bias=False, name="neck_conv1"),
                nn.LayerNorm(epsilon=1e-6, name="neck_ln1"),
                nn.Conv(
                    self.d_model, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2",
                ),
                nn.LayerNorm(epsilon=1e-6, name="neck_ln2"),
            ]
        )
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.d_model,
            image_embedding_size=(self.embed_size, self.embed_size),
            input_image_size=(self.image_size, self.image_size),
            name="sam_prompt_encoder",
        )
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=self.d_model,
            use_high_res_features=False,
            pred_obj_scores=False,
            dynamic_multimask_via_stability=False,
            dtype=self.dtype,
            name="sam_mask_decoder",
        )

    def encode_image(self, images, *, train: bool = False):
        """(B, H, W, 3) normalized -> (B, 64, 64, 256)."""
        feats = self.trunk(images, train=train)
        if feats.ndim == 3:  # tokens -> map
            b, l, c = feats.shape
            s = int(l**0.5)
            feats = feats.reshape(b, s, s, c)
        feats = self.neck(feats)
        if feats.shape[1:3] != (self.embed_size, self.embed_size):
            feats = jax.image.resize(
                feats,
                (feats.shape[0], self.embed_size, self.embed_size, feats.shape[-1]),
                "linear",
            )
        return feats

    def predict_masks(
        self, embeddings, point_coords, point_labels, multimask_output: bool,
        *, train: bool = False,
    ):
        """embeddings (B, 64, 64, 256); coords (B, P, 2) in input pixels."""
        sparse, dense = self.sam_prompt_encoder(point_coords, point_labels, None)
        image_pe = self.sam_prompt_encoder.dense_pe()
        low_res, ious, _, _ = self.sam_mask_decoder(
            embeddings, image_pe, sparse, dense, multimask_output, None,
            train=train,
        )
        return low_res, ious

    def __call__(self, images, point_coords, point_labels,
                 multimask_output: bool = True, *, train: bool = False):
        emb = self.encode_image(images, train=train)
        return self.predict_masks(
            emb, point_coords, point_labels, multimask_output, train=train
        )


def _make_trunk(backbone_type: str, model_name: str, dtype=None):
    from efficientsam3_tpu.build import BACKBONE_REGISTRY, SIZE_ALIASES

    model_name = SIZE_ALIASES.get((backbone_type, model_name.lower()), model_name)
    return BACKBONE_REGISTRY[backbone_type][model_name](dtype=dtype)


def build_edge_sam(dtype=None):
    """EdgeSAM: RepViT-M1 encoder (reference build_sam.py:60)."""
    return SamStudentModel(trunk=_make_trunk("repvit", "m1.1", dtype), dtype=dtype)


def build_sam_student(backbone_type: str = "repvit", model_name: str = "m1.1",
                      dtype=None):
    return SamStudentModel(
        trunk=_make_trunk(backbone_type, model_name, dtype), dtype=dtype
    )


def build_sam_vit_student(variant: str = "vit_b", dtype=None):
    """ViT-encoder SAM1 (reference build_sam_vit_{h,l,b}); uses the in-repo
    ViTDet trunk scaled to the SAM1 depths."""
    from efficientsam3_tpu.models.vitdet import ViTTrunk

    cfgs = {
        "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                      global_att_blocks=(2, 5, 8, 11), mlp_ratio=4.0),
        "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                      global_att_blocks=(5, 11, 17, 23), mlp_ratio=4.0),
        "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                      global_att_blocks=(7, 15, 23, 31), mlp_ratio=4.0),
    }[variant]
    trunk = ViTTrunk(
        patch_size=16, window_size=14, pretrain_grid=64, dtype=dtype, **cfgs
    )
    return SamStudentModel(trunk=trunk, dtype=dtype)


sam_model_registry = {
    "default": build_edge_sam,
    "edge_sam": build_edge_sam,
    "vit_b": lambda dtype=None: build_sam_vit_student("vit_b", dtype),
    "vit_l": lambda dtype=None: build_sam_vit_student("vit_l", dtype),
    "vit_h": lambda dtype=None: build_sam_vit_student("vit_h", dtype),
    "repvit": lambda dtype=None: build_sam_student("repvit", "m1.1", dtype),
    "tinyvit": lambda dtype=None: build_sam_student("tinyvit", "5m", dtype),
    "efficientvit": lambda dtype=None: build_sam_student("efficientvit", "b1", dtype),
}


class SamStudentPredictor:
    """SAM1 predictor facade (reference student_sam/predictor.py:18)."""

    def __init__(self, model: SamStudentModel, variables):
        self.model = model
        self.variables = variables
        self._emb = None
        self._orig_hw = None
        self._encode = jax.jit(
            lambda v, x: model.apply(v, x, method=model.encode_image)
        )
        self._predict = jax.jit(
            lambda v, e, c, l, m: model.apply(
                v, e, c, l, m, method=model.predict_masks
            ),
            static_argnums=(4,),
        )

    def set_image(self, image: np.ndarray):
        h, w = image.shape[:2]
        x = jnp.asarray(image)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        r = self.model.image_size
        x = jax.image.resize(x, (r, r, 3), "linear", antialias=True)
        x = ((x - 0.5) / 0.5)[None]
        self._emb = self._encode(self.variables, x)
        self._orig_hw = (h, w)

    def predict(self, point_coords=None, point_labels=None, box=None,
                multimask_output: bool = True):
        assert self._emb is not None, "call set_image first"
        h, w = self._orig_hw
        r = self.model.image_size
        sx, sy = r / w, r / h
        n = (2 if box is not None else 0) + (
            len(point_coords) if point_coords is not None else 0
        )
        pts = np.zeros((1, n + 1, 2), np.float32)
        labs = -np.ones((1, n + 1), np.int32)
        k = 0
        if box is not None:
            b = np.asarray(box, np.float32)
            pts[0, 0] = [b[0] * sx, b[1] * sy]
            pts[0, 1] = [b[2] * sx, b[3] * sy]
            labs[0, 0], labs[0, 1] = 2, 3
            k = 2
        if point_coords is not None:
            pts[0, k : k + len(point_coords)] = (
                np.asarray(point_coords, np.float32) * [sx, sy]
            )
            labs[0, k : k + len(point_coords)] = np.asarray(point_labels, np.int32)
        low, ious = self._predict(
            self.variables, self._emb, jnp.asarray(pts), jnp.asarray(labs),
            multimask_output,
        )
        from efficientsam3_tpu.ops.interpolate import resize_bilinear

        masks = np.asarray(resize_bilinear(low, (h, w)))[0] > 0
        return masks, np.asarray(ious)[0], np.asarray(low)[0]
