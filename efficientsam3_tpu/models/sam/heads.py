"""SAM prompt encoder / two-way transformer / mask decoder (flax, NHWC).

TPU-native re-design of the reference SAM heads:
  - PromptEncoder: reference sam3/sam3/sam/prompt_encoder.py:12. Prompts are
    fixed-width padded arrays (labels==-1 are padding), so every call shape
    is static under jit — no optional-arg branching.
  - TwoWayTransformer: reference sam3/sam3/sam/transformer.py:16.
  - MaskDecoder: reference sam3/sam3/sam/mask_decoder.py:12, including SAM2
    extensions (object score token, high-res skip features, dynamic
    multimask-via-stability as a data-parallel jnp.where select).

All spatial tensors are NHWC; sequence tensors are (B, N, C).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import (
    MLP,
    Attention,
    ConvTranspose2x,
    LayerNorm2d,
    MLPBlock,
    PositionEmbeddingRandom,
    gelu_exact,
    sdpa,
)


class PromptEncoder(nn.Module):
    """Encode padded point/box prompts and optional mask prompts.

    Point labels (torch convention, reference prompt_encoder.py:91-115):
      -1 padding / not-a-point, 0 negative click, 1 positive click,
       2 box top-left corner, 3 box bottom-right corner.
    """

    embed_dim: int = 256
    image_embedding_size: tuple = (72, 72)
    input_image_size: tuple = (1008, 1008)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 4 point embeddings (neg, pos, box TL, box BR) + not-a-point
        self.point_embeddings = [
            nn.Embed(1, self.embed_dim, name=f"point_embeddings_{i}") for i in range(4)
        ]
        self.not_a_point_embed = nn.Embed(1, self.embed_dim)
        self.no_mask_embed = nn.Embed(1, self.embed_dim)
        c = self.mask_in_chans
        self.mask_conv1 = nn.Conv(c // 4, (2, 2), strides=(2, 2), name="mask_down_0")
        self.mask_ln1 = LayerNorm2d(name="mask_down_ln0")
        self.mask_conv2 = nn.Conv(c, (2, 2), strides=(2, 2), name="mask_down_1")
        self.mask_ln2 = LayerNorm2d(name="mask_down_ln1")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), name="mask_down_2")

    def embed_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points: (B, P, 2) pixel xy; labels: (B, P) int. -> (B, P, C)."""
        pts = (points.astype(jnp.float32) + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = self.pe_layer(pts)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed.embedding[0], pe)
        for i in range(4):
            point_w = self.point_embeddings[i].embedding[0]
            emb = jnp.where(lab == i, pe + point_w, emb)
        return emb

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """masks: (B, 4*Eh, 4*Ew, 1) -> (B, Eh, Ew, C)."""
        x = self.mask_conv1(masks)
        x = gelu_exact(self.mask_ln1(x))
        x = self.mask_conv2(x)
        x = gelu_exact(self.mask_ln2(x))
        return self.mask_conv3(x)

    def no_mask_dense(self, batch: int) -> jnp.ndarray:
        h, w = self.image_embedding_size
        w_emb = self.no_mask_embed.embedding[0]
        return jnp.broadcast_to(w_emb[None, None, None, :], (batch, h, w, self.embed_dim))

    def dense_pe(self) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)

    def __call__(self, points, labels, masks: Optional[jnp.ndarray] = None):
        sparse = self.embed_points(points, labels)
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense(points.shape[0])
        return sparse, dense


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        d, h = self.embedding_dim, self.num_heads
        if self.skip_first_layer_pe:
            queries = Attention(d, h, dtype=self.dtype, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + Attention(d, h, dtype=self.dtype, name="self_attn")(
                q, q, queries
            )
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            d, h, self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, jax.nn.relu, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            d, h, self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C); point_embedding: (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c) if image_pe.ndim == 4 else image_pe
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim,
                self.num_heads,
                self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim,
            self.num_heads,
            self.attention_downsample_rate,
            dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    transformer_depth: int = 2
    transformer_num_heads: int = 8
    transformer_mlp_dim: int = 2048
    dtype: Optional[jnp.dtype] = None

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    def setup(self):
        d = self.transformer_dim
        self.transformer = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=d,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            dtype=self.dtype,
        )
        self.iou_token = nn.Embed(1, d)
        self.mask_tokens = nn.Embed(self.num_mask_tokens, d)
        if self.pred_obj_scores:
            self.obj_score_token = nn.Embed(1, d)
            if self.pred_obj_scores_mlp:
                self.pred_obj_score_head = MLP(d, 1, 3, name="pred_obj_score_head")
            else:
                self.pred_obj_score_head = nn.Dense(1, name="pred_obj_score_head")
        # NOTE: these stay nn.ConvTranspose — the ConvTranspose2x einsum
        # formulation that wins at the neck shapes (1024ch) lowers to a
        # multiply+reduce with materialized broadcast constants at these
        # small channel counts (64/32ch at 8-slot batch), measured slower.
        self.up_dconv1 = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), padding="VALID", name="output_upscaling_0"
        )
        self.up_ln = LayerNorm2d(name="output_upscaling_ln")
        self.up_dconv2 = nn.ConvTranspose(
            d // 8, (2, 2), strides=(2, 2), padding="VALID", name="output_upscaling_1"
        )
        if self.use_high_res_features:
            # Owned here but applied on the SAM2-neck FPN levels by callers
            # (reference sam3/sam3/sam/mask_decoder.py:74-80, applied in
            # sam3_image_processor.py:64-76).
            self.conv_s0 = nn.Conv(d // 8, (1, 1), name="conv_s0")
            self.conv_s1 = nn.Conv(d // 4, (1, 1), name="conv_s1")
        self.hyper_mlps = [
            MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim,
            self.num_mask_tokens,
            self.iou_head_depth,
            sigmoid_output=self.iou_prediction_use_sigmoid,
            name="iou_prediction_head",
        )

    def high_res_convs(self, feat_s0, feat_s1):
        """Project SAM2-neck levels for the skip connections (NHWC)."""
        return self.conv_s0(feat_s0), self.conv_s1(feat_s1)

    def predict_masks(
        self,
        image_embeddings,  # (B, H, W, C) or (1, H, W, C) with repeat_image
        image_pe,  # (H, W, C) or (1, H, W, C)
        sparse_prompt_embeddings,  # (B, N, C)
        dense_prompt_embeddings,  # (B, H, W, C)
        high_res_features=None,  # (feat_s0 (B,4H,4W,C/8), feat_s1 (B,2H,2W,C/4))
    ):
        b = sparse_prompt_embeddings.shape[0]
        d = self.transformer_dim
        toks = [self.iou_token.embedding, self.mask_tokens.embedding]
        s = 0
        if self.pred_obj_scores:
            toks = [self.obj_score_token.embedding] + toks
            s = 1
        output_tokens = jnp.concatenate(toks, axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b, output_tokens.shape[0], d)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        src = jnp.broadcast_to(
            image_embeddings, (b,) + image_embeddings.shape[1:]
        ) + dense_prompt_embeddings
        if image_pe.ndim == 3:
            image_pe = image_pe[None]
        pos_src = jnp.broadcast_to(image_pe, src.shape)

        hs, src_out = self.transformer(src, pos_src, tokens)
        iou_token_out = hs[:, s, :]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens, :]

        h, w = src.shape[1], src.shape[2]
        src_img = src_out.reshape(b, h, w, d)
        if self.use_high_res_features and high_res_features is not None:
            feat_s0, feat_s1 = high_res_features
            up = gelu_exact(self.up_ln(self.up_dconv1(src_img) + feat_s1))
            up = gelu_exact(self.up_dconv2(up) + feat_s0)
        else:
            up = gelu_exact(self.up_ln(self.up_dconv1(src_img)))
            up = gelu_exact(self.up_dconv2(up))

        hyper_in = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i]) for i in range(self.num_mask_tokens)],
            axis=1,
        )  # (B, T, C/8)
        uh, uw = up.shape[1], up.shape[2]
        masks = jnp.einsum(
            "btc,bhwc->bthw", hyper_in, up, preferred_element_type=jnp.float32
        ).astype(up.dtype)

        iou_pred = self.iou_prediction_head(iou_token_out)
        if self.pred_obj_scores:
            object_score_logits = self.pred_obj_score_head(hs[:, 0, :])
        else:
            object_score_logits = 10.0 * jnp.ones((b, 1), iou_pred.dtype)
        return masks, iou_pred, mask_tokens_out, object_score_logits

    def _stability_scores(self, mask_logits):
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        delta = self.dynamic_multimask_stability_delta
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)

    def _dynamic_multimask(self, all_masks, all_ious):
        multi = all_masks[:, 1:]
        multi_iou = all_ious[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        best_mask = jnp.take_along_axis(multi, best[:, None, None, None], axis=1)
        best_iou = jnp.take_along_axis(multi_iou, best[:, None], axis=1)
        single_mask = all_masks[:, 0:1]
        single_iou = all_ious[:, 0:1]
        stable = (
            self._stability_scores(single_mask)
            >= self.dynamic_multimask_stability_thresh
        )
        masks = jnp.where(stable[..., None, None], single_mask, best_mask)
        ious = jnp.where(stable, single_iou, best_iou)
        return masks, ious

    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt_embeddings,
        dense_prompt_embeddings,
        multimask_output: bool,
        high_res_features=None,
        train: bool = False,
    ):
        masks, iou_pred, mask_tokens_out, object_score_logits = self.predict_masks(
            image_embeddings,
            image_pe,
            sparse_prompt_embeddings,
            dense_prompt_embeddings,
            high_res_features,
        )
        if multimask_output:
            out_masks = masks[:, 1:]
            out_ious = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability and not train:
            out_masks, out_ious = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_ious = iou_pred[:, 0:1]
        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_ious, sam_tokens_out, object_score_logits
