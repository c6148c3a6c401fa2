"""SAM2-style streaming-memory tracker core (device side).

Mirrors reference sam3/sam3/model/sam3_tracker_base.py (Sam3TrackerBase :27)
with the builder config (model_builder.py:432-484): 72x72 tokens at d=256,
num_maskmem 7, 64-dim memory space, 4-layer RoPE memory attention, SAM
prompt encoder + mask decoder heads, object pointers (split into 4 64-dim
tokens each), no-object embeddings, sigmoid(mask)*20-10 memory encoding.

TPU-first redesign: the reference's dict-of-frames memory and python frame
loops become a FIXED-shape memory bank assembled on host (tiny index logic)
and consumed by jitted methods with static shapes:

  - `condition_features`: memory attention over a padded bank of
    num_maskmem spatial memories (validity-masked) + max_obj_ptrs pointers.
  - `forward_sam_heads`: prompt encoder + mask decoder on the conditioned
    features; best-mask selection and pointer extraction are data-parallel
    selects (no host sync).
  - `encode_memory`: memory encoder + no-object spatial embedding.

The object axis is the batch axis: all tracked objects of a frame step in
one program (reference shards objects across GPUs; here they vectorize and
shard over the mesh in video/pipeline.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import MLP
from efficientsam3_tpu.models.memory_attention import MemoryAttention
from efficientsam3_tpu.models.memory_encoder import MemoryEncoder
from efficientsam3_tpu.models.sam import MaskDecoder, PromptEncoder
from efficientsam3_tpu.ops.interpolate import resize_bilinear

NO_OBJ_SCORE = -1024.0


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """reference sam3_tracker_utils.py:350."""
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


class TrackerCore(nn.Module):
    """Device-side tracker: memory attention + SAM heads + memory encoder."""

    image_size: int = 1008
    backbone_stride: int = 14
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    dtype: Optional[jnp.dtype] = None

    @property
    def feat_size(self):
        return self.image_size // self.backbone_stride  # 72

    @property
    def low_res_mask_size(self):
        return self.feat_size * 4  # 288

    def setup(self):
        d, md = self.d_model, self.mem_dim
        fs = self.feat_size
        self.memory_attention = MemoryAttention(
            d_model=d, kv_in_dim=md, dtype=self.dtype, name="memory_attention"
        )
        interp = self.feat_size * 16  # 1152 at the reference 1008/14 config
        self.memory_encoder = MemoryEncoder(
            out_dim=md, in_dim=d, interpol_size=(interp, interp),
            dtype=self.dtype, name="memory_encoder",
        )
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=d,
            image_embedding_size=(fs, fs),
            input_image_size=(self.image_size, self.image_size),
            name="sam_prompt_encoder",
        )
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=d, dtype=self.dtype, name="sam_mask_decoder"
        )
        self.obj_ptr_proj = MLP(d, d, 3, name="obj_ptr_proj")
        self.obj_ptr_tpos_proj = nn.Dense(md, name="obj_ptr_tpos_proj")
        self.mask_downsample = nn.Conv(
            1, (4, 4), strides=(4, 4), name="mask_downsample"
        )
        tn = nn.initializers.truncated_normal(0.02)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", tn, (self.num_maskmem, 1, 1, md)
        )
        self.no_mem_embed = self.param("no_mem_embed", tn, (1, 1, d))
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", tn, (1, 1, d))
        self.no_obj_ptr = self.param("no_obj_ptr", tn, (1, d))
        self.no_obj_embed_spatial = self.param("no_obj_embed_spatial", tn, (1, md))

    # ------------------------------------------------------------------

    def no_mem_features(self, vision_tokens):
        """First/cond-frame path: add no_mem_embed (tracker_base.py:768)."""
        return vision_tokens + self.no_mem_embed[0]

    def condition_features(
        self,
        vision_tokens,  # (B, HW, C)
        vision_pos,  # (HW, C) or (B, HW, C)
        mem_feats,  # (B, num_maskmem, Hm, Wm, mem_dim)
        mem_tpos_idx,  # (B, num_maskmem) int in [0, num_maskmem-1]
        mem_valid,  # (B, num_maskmem) bool
        obj_ptrs,  # (B, max_obj_ptrs, C)
        ptr_tdiff,  # (B, max_obj_ptrs) float frame distances
        ptr_valid,  # (B, max_obj_ptrs) bool
        max_tdiff: float = 16.0,
        *,
        train: bool = False,
    ):
        """Memory attention with a fixed-size bank (tracker_base.py:562)."""
        b, n_mem, hm, wm, md = mem_feats.shape
        c = self.d_model

        # spatial memory tokens + sine pos + temporal slot embedding
        from efficientsam3_tpu.models.common import sine_pos_embed_2d

        spatial_pos = sine_pos_embed_2d(hm, wm, md)  # (Hm, Wm, md)
        tpos = self.maskmem_tpos_enc[
            self.num_maskmem - 1 - mem_tpos_idx
        ]  # (B, n_mem, 1, 1, md)
        mem_pos = spatial_pos[None, None] + tpos
        mem_tok = mem_feats.reshape(b, n_mem * hm * wm, md)
        mem_pos = jnp.broadcast_to(mem_pos, mem_feats.shape).reshape(
            b, n_mem * hm * wm, md
        )
        mem_mask = ~jnp.repeat(mem_valid, hm * wm, axis=1)

        # object pointers -> 4 tokens of 64 each, sine tpos projected
        n_ptr = obj_ptrs.shape[1]
        split = c // md  # 4
        ptr_tok = obj_ptrs.reshape(b, n_ptr, split, md).reshape(b, n_ptr * split, md)
        tpe = get_1d_sine_pe(ptr_tdiff / jnp.maximum(max_tdiff - 1.0, 1.0), c)
        tpe = self.obj_ptr_tpos_proj(tpe)  # (B, n_ptr, md)
        ptr_pos = jnp.repeat(tpe, split, axis=1)
        ptr_mask = ~jnp.repeat(ptr_valid, split, axis=1)

        memory = jnp.concatenate([mem_tok, ptr_tok], axis=1)
        memory_pos = jnp.concatenate([mem_pos, ptr_pos], axis=1)
        memory_mask = jnp.concatenate([mem_mask, ptr_mask], axis=1)
        return self.memory_attention(
            vision_tokens, vision_pos, memory, memory_pos, memory_mask,
            num_obj_ptr_tokens=n_ptr * split, train=train,
        )

    # -------- cached-bank fast path (see memory_attention.py docstring) ----

    def encode_memory_kv(self, mem):
        """Per-layer cached cross-attention keys of one memory entry.

        mem (B, Hm, Wm, mem_dim) from encode_memory. Returns
        (k (L, B, Hm*Wm, internal_dim), v_raw (B, Hm*Wm, mem_dim)):
        k includes the spatial sine pos and rotary encoding
        (frame-invariant), NOT the slot-age temporal embedding (added at
        attend time via tpos_k_delta); v_raw is the raw memory tokens —
        values are attended unprojected and up-projected after attention
        (attend_projected_rawv), so the value cache is mem_dim wide and
        layer-independent. The layer axis leads so the persistent bank
        (L, B, n_mem, S_e, C) slices per layer without copies."""
        from efficientsam3_tpu.models.common import sine_pos_embed_2d

        b, hm, wm, md = mem.shape
        s_e = hm * wm
        pos = sine_pos_embed_2d(hm, wm, md).reshape(s_e, md)
        k = self.memory_attention.project_bank_entry(
            mem.reshape(b, s_e, md), pos, grid_tokens=s_e
        )
        return k[:, :, 0], mem.reshape(b, s_e, md)

    def tpos_k_delta(self):
        """Rope'd per-layer linear images of the slot-age embeddings.

        k_proj is affine, so k(entry + pos + tpos_age) =
        [cached k(entry + pos)] + rope(W_l . tpos_age) — this returns that
        additive delta, (L, num_maskmem ages, Hm*Wm, internal). The bias is
        cancelled via k_proj(t) - k_proj(0)."""
        from efficientsam3_tpu.models.common import apply_rope

        fs = self.feat_size
        s_e = fs * fs
        tpos = self.maskmem_tpos_enc[:, 0, 0, :]  # (num_maskmem, md)
        zeros = jnp.zeros_like(tpos)
        deltas = []
        for layer in self.memory_attention.layers:
            att = layer.cross_attn_image
            w = att.k_proj(tpos) - att.k_proj(zeros)  # (num_maskmem, C)
            cos, sin = att._rope_tables(s_e)
            rot = apply_rope(
                jnp.broadcast_to(
                    w[:, None, :], (w.shape[0], s_e, w.shape[-1])
                ),
                cos, sin,
            )
            deltas.append(rot)
        return jnp.stack(deltas)  # (L, num_maskmem, S_e, C)

    def condition_features_cached(
        self,
        vision_tokens,  # (B, HW, C)
        vision_pos,  # (HW, C) or (B, HW, C)
        k_bank,  # (L, B, S_pad, C) cached entry keys, flat + pre-padded
        v_bank,  # (B, S_pad, mem_dim) RAW entry tokens, flat + pre-padded
        mem_tpos_idx,  # (B, num_maskmem) int
        mem_valid,  # (B, num_maskmem) bool
        obj_ptrs,  # (B, max_obj_ptrs, C)
        ptr_tdiff,  # (B, max_obj_ptrs)
        ptr_valid,  # (B, max_obj_ptrs)
        tpos_delta,  # (L, num_maskmem ages, S_e, C) from tpos_k_delta
        max_tdiff: float = 16.0,
        *,
        shared_ages: bool = False,
        quantize_bank: bool = False,
        train: bool = False,
    ):
        """condition_features over a cached bank: per frame only the
        queries and the object-pointer tokens are projected; the ~36k memory
        tokens' keys come from the cache with an additive age delta, and
        their values stay raw mem_dim tokens (up-projected after attention,
        exactly — attend_projected_rawv).

        HBM discipline (the bank is ~148 MB/layer at flagship dims): the
        layer axis leads so per-layer slices are views; the bank arrives
        flat and PRE-PADDED to the kernel's block grid (flatten_kv_bank),
        so the age-delta gather+add is the ONLY per-layer pass over the
        bank (no per-call pad copy); pointer keys are attended as a
        separate segment and merged by log-sum-exp
        (attend_projected_rawv_2seg) instead of concatenated. Pad rows are
        masked via mem_mask.

        shared_ages=True (static): every slot holds the same frame per bank
        column — the predictor's cached-bank precondition
        (video/predictor.py _assemble_kv_bank) — so the age gather is one
        (S_tot, C) table slice broadcast over slots instead of B private
        copies (a ~4x HBM cut on the per-layer delta pass at 8 slots), and
        the add covers the zero pad tail directly (delta pad rows are
        zero), dropping the per-layer concat.

        quantize_bank=True (static, opt-in serving mode): the age-adjusted
        bank keys are symmetric-int8 row-quantized per frame and the QK
        product runs on the int8 MXU path (2x the bf16 rate on v5e, half
        the bank bytes streamed). Values, softmax, and AV stay exact
        bf16/f32 — only the memory-key logits carry ~1e-2 relative
        quantization noise (tests/test_memory_kv_cache.py pins the
        end-to-end drift)."""
        n_layers, b, s_pad, c = k_bank.shape
        n_mem = mem_valid.shape[1]
        s_e = tpos_delta.shape[2]
        s_tot = n_mem * s_e
        cd = self.d_model
        md = self.mem_dim

        age = self.num_maskmem - 1 - mem_tpos_idx  # (B, n_mem)
        v_mem = v_bank[:, None]  # (B, 1, S_pad, md)
        mem_mask = ~jnp.repeat(mem_valid, s_e, axis=1)
        if s_pad != s_tot:
            mem_mask = jnp.pad(
                mem_mask, ((0, 0), (0, s_pad - s_tot)), constant_values=True
            )

        # object pointers: tiny, projected per frame per layer
        n_ptr = obj_ptrs.shape[1]
        split = cd // md
        ptr_tok = obj_ptrs.reshape(b, n_ptr, split, md).reshape(
            b, n_ptr * split, md
        )
        tpe = get_1d_sine_pe(ptr_tdiff / jnp.maximum(max_tdiff - 1.0, 1.0), cd)
        tpe = self.obj_ptr_tpos_proj(tpe)
        ptr_pos = jnp.repeat(tpe, split, axis=1)
        ptr_mask = ~jnp.repeat(ptr_valid, split, axis=1)

        k_mem_layers = []
        k_ptr_layers = []
        zero_tail = (
            jnp.zeros((b, s_pad - s_tot, c), k_bank.dtype)
            if s_pad != s_tot else None
        )
        for li, layer in enumerate(self.memory_attention.layers):
            # gather per-entry age deltas and add them to the leading
            # (valid) rows of the padded bank slice; explicit slice + add +
            # concat (NOT .at[].add, which lowers to a 2.6 ms scatter) —
            # pad rows are zeros and masked, so a fresh zero tail is exact
            if shared_ages:
                d_one = tpos_delta[li][age[0]].reshape(s_tot, c)
                d_one = d_one.astype(k_bank.dtype)
                if s_pad != s_tot:
                    d_one = jnp.pad(d_one, ((0, s_pad - s_tot), (0, 0)))
                k_adj = k_bank[li] + d_one[None]
            else:
                d_sel = tpos_delta[li][age].reshape(b, s_tot, c)
                k_adj = k_bank[li, :, :s_tot] + d_sel.astype(k_bank.dtype)
                if zero_tail is not None:
                    k_adj = jnp.concatenate([k_adj, zero_tail], axis=1)
            if quantize_bank:
                from efficientsam3_tpu.ops.pallas.flash_attention import (
                    quantize_rows,
                )

                k_i8, ks = quantize_rows(k_adj)
                k_mem_layers.append((k_i8[:, None], ks[:, None]))
            else:
                k_mem_layers.append(k_adj[:, None])  # (B, 1, S_pad, C)
            k_in = ptr_tok + ptr_pos if layer.pos_enc_at_cross_attn_keys else ptr_tok
            kp, _ = layer.cross_attn_image.project_kv(
                k_in, ptr_tok, grid_tokens=s_e,
                num_k_exclude_rope=n_ptr * split,
            )
            k_ptr_layers.append(kp)
        v_ptr = ptr_tok.astype(v_mem.dtype)[:, None]  # (B, 1, S_ptr, md)
        return self.memory_attention.forward_cached(
            vision_tokens, vision_pos, k_mem_layers, v_mem, mem_mask,
            k_ptr_layers, v_ptr, ptr_mask, train=train,
        )

    # ------------------------------------------------------------------

    def forward_sam_heads(
        self,
        pix_feat,  # (B, Hf, Wf, C) conditioned features, NHWC
        point_coords,  # (B, P, 2) pixel xy (padded with label -1)
        point_labels,  # (B, P) int
        high_res_features,  # (s0 (B,4H,4W,C/8), s1 (B,2H,2W,C/4))
        multimask_output: bool,
        mask_prompt=None,  # (B, 4Hf, 4Wf, 1) low-res mask logits or None
        *,
        train: bool = False,
    ):
        """reference tracker_base.py:220 _forward_sam_heads."""
        b = pix_feat.shape[0]
        if mask_prompt is not None:
            need = 4 * self.feat_size
            if mask_prompt.shape[1:3] != (need, need):
                # reference resizes mask prompts to the prompt-encoder input
                # size with antialiased bilinear (tracker_base.py:289-297)
                mask_prompt = jax.image.resize(
                    mask_prompt.astype(jnp.float32),
                    (mask_prompt.shape[0], need, need, 1),
                    "linear",
                    antialias=True,
                )
        sparse, dense = self.sam_prompt_encoder(point_coords, point_labels, mask_prompt)
        image_pe = self.sam_prompt_encoder.dense_pe()
        low_res_multimasks, ious, sam_tokens, object_score_logits = (
            self.sam_mask_decoder(
                pix_feat, image_pe, sparse, dense, multimask_output,
                high_res_features, train=train,
            )
        )
        is_obj = object_score_logits > 0  # (B, 1)
        low_res_multimasks = jnp.where(
            is_obj[:, :, None, None], low_res_multimasks, NO_OBJ_SCORE
        ).astype(jnp.float32)

        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            low_res_masks = jnp.take_along_axis(
                low_res_multimasks, best[:, None, None, None], axis=1
            )
            if sam_tokens.shape[1] > 1:
                sam_token = jnp.take_along_axis(
                    sam_tokens, best[:, None, None], axis=1
                )[:, 0]
            else:
                sam_token = sam_tokens[:, 0]
        else:
            low_res_masks = low_res_multimasks
            sam_token = sam_tokens[:, 0]

        high_res_masks = resize_bilinear(
            low_res_masks, (self.image_size, self.image_size)
        )

        obj_ptr = self.obj_ptr_proj(sam_token)
        lam = is_obj.astype(obj_ptr.dtype)
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr

        return {
            "low_res_multimasks": low_res_multimasks,
            "ious": ious,
            "low_res_masks": low_res_masks,  # (B, 1, 288, 288)
            "high_res_masks": high_res_masks,  # (B, 1, 1008, 1008)
            "obj_ptr": obj_ptr,  # (B, C)
            "object_score_logits": object_score_logits,  # (B, 1)
        }

    def use_mask_as_output(self, pix_feat, high_res_features, mask_inputs):
        """Directly adopt a given binary mask (tracker_base.py:393).

        mask_inputs: (B, Himg, Wimg, 1) binary.
        """
        out_scale, out_bias = 20.0, -10.0
        m = mask_inputs.astype(jnp.float32)
        high_res_masks = (m * out_scale + out_bias).transpose(0, 3, 1, 2)
        lr = self.low_res_mask_size
        low_res_masks = resize_bilinear(high_res_masks, (lr, lr))
        down = self.mask_downsample(m)  # (B, H/4, W/4, 1) -> prompt-encoder size
        heads = self.forward_sam_heads(
            pix_feat,
            jnp.zeros((m.shape[0], 1, 2), jnp.float32),
            -jnp.ones((m.shape[0], 1), jnp.int32),
            high_res_features,
            multimask_output=False,
            mask_prompt=down,
        )
        is_obj = jnp.any(m.reshape(m.shape[0], -1) > 0, axis=1)[:, None]
        lam = is_obj.astype(jnp.float32)
        object_score_logits = out_scale * lam + out_bias
        obj_ptr = lam * heads["obj_ptr"] + (1 - lam) * self.no_obj_ptr
        return {
            "low_res_multimasks": low_res_masks,
            "ious": jnp.ones((m.shape[0], 1), jnp.float32),
            "low_res_masks": low_res_masks,
            "high_res_masks": high_res_masks,
            "obj_ptr": obj_ptr,
            "object_score_logits": object_score_logits,
        }

    # ------------------------------------------------------------------

    def encode_memory(
        self,
        vision_tokens,  # (B, HW, C) (un-conditioned backbone tokens)
        high_res_masks,  # (B, 1, Himg, Wimg) logits
        object_score_logits,  # (B, 1)
        is_mask_from_pts: bool = False,
    ):
        """reference tracker_base.py:799 _encode_new_memory."""
        b = vision_tokens.shape[0]
        fs = self.feat_size
        pix_feat = vision_tokens.reshape(b, fs, fs, self.d_model)
        masks = high_res_masks.transpose(0, 2, 3, 1)  # NHWC
        if is_mask_from_pts:
            mask_for_mem = (masks > 0).astype(jnp.float32)
        else:
            mask_for_mem = jax.nn.sigmoid(masks)
        mask_for_mem = (
            mask_for_mem * self.sigmoid_scale_for_mem_enc
            + self.sigmoid_bias_for_mem_enc
        )
        mem, pos = self.memory_encoder(pix_feat, mask_for_mem, skip_mask_sigmoid=True)
        is_obj = (object_score_logits > 0).astype(mem.dtype)  # (B, 1)
        mem = mem + (1.0 - is_obj[:, :, None, None]) * self.no_obj_embed_spatial[0]
        return mem  # (B, Hm, Wm, mem_dim); pos is a pure fn of shape


def flatten_kv_bank(k_entries, v_entries):
    """Stack per-entry caches into the flat pre-padded persistent bank.

    k_entries: n_mem sequence of (L, B, S_e, C) from encode_memory_kv;
    v_entries: n_mem sequence of (B, S_e, mem_dim). Returns
    (k_bank (L, B, S_pad, C), v_bank (B, S_pad, mem_dim)) with
    S_pad = padded_bank_len(n_mem * S_e). Pad rows are zeros and stay
    masked (condition_features_cached extends mem_mask over them) — the
    one-time pad here makes flash_memattn's per-call block padding a
    no-op instead of a fresh bank-sized copy every frame. Entry j
    occupies rows [j*S_e, (j+1)*S_e); per-frame column updates are
    dynamic-update-slices at those offsets."""
    from efficientsam3_tpu.ops.pallas.flash_attention import padded_bank_len

    k = jnp.concatenate(list(k_entries), axis=2)  # (L, B, n_mem*S_e, C)
    v = jnp.concatenate(list(v_entries), axis=1)  # (B, n_mem*S_e, md)
    s_tot = k.shape[2]
    pad = padded_bank_len(s_tot) - s_tot
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    return k, v


def init_tracker_variables(core: TrackerCore, rng):
    """Random-init ALL of a TrackerCore's parameters in one call.

    Flax creates params lazily per applied method, so a plain init() only
    covers one path; this initializes every jitted method (memory attention,
    SAM heads, high-res convs, mask-as-output, memory encoder) and merges
    the subtrees — the from-scratch counterpart of
    utils/convert_model.convert_tracker_core.
    """
    fs, d, md = core.feat_size, core.d_model, core.mem_dim
    b = 1
    tokens = jnp.zeros((b, fs * fs, d))
    s0 = jnp.zeros((b, 4 * fs, 4 * fs, d // 8))
    s1 = jnp.zeros((b, 2 * fs, 2 * fs, d // 4))
    coords = jnp.zeros((b, 2, 2))
    labels = -jnp.ones((b, 2), jnp.int32)
    img = core.image_size

    # Each init runs under jit: eager init on a remote (tunneled) backend
    # dispatches op-by-op at ~26 ms RTT per fetch and takes minutes; jitted
    # it is one program. Arrays go in as jit args (never closures — large
    # literal constants in the HLO are rejected by the remote compiler).
    v1 = jax.jit(
        lambda r, t, c, l, s: core.init(
            r, t.reshape(b, fs, fs, d), c, l, s, True,
            method=core.forward_sam_heads,
        )
    )(rng, tokens, coords, labels, (s0, s1))
    v2 = jax.jit(
        lambda r, t, *a: core.init(r, t, *a, method=core.condition_features)
    )(
        rng, tokens, jnp.zeros((fs * fs, d)),
        jnp.zeros((b, core.num_maskmem, fs, fs, md)),
        jnp.zeros((b, core.num_maskmem), jnp.int32),
        jnp.ones((b, core.num_maskmem), bool),
        jnp.zeros((b, core.max_obj_ptrs, d)),
        jnp.zeros((b, core.max_obj_ptrs)),
        jnp.ones((b, core.max_obj_ptrs), bool),
    )
    v3 = jax.jit(
        lambda r, t, m, o: core.init(r, t, m, o, False, method=core.encode_memory)
    )(rng, tokens, jnp.zeros((b, 1, img, img)), jnp.zeros((b, 1)))
    # high_res_convs maps the RAW neck levels (d channels) down to d/8, d/4
    v4 = jax.jit(
        lambda r, a, c: core.init(
            r, a, c, method=lambda m, x, y: m.sam_mask_decoder.high_res_convs(x, y)
        )
    )(rng, jnp.zeros((b, 4 * fs, 4 * fs, d)), jnp.zeros((b, 2 * fs, 2 * fs, d)))
    v5 = jax.jit(
        lambda r, t, s, mk: core.init(
            r, t.reshape(b, fs, fs, d), s, mk, method=core.use_mask_as_output
        )
    )(rng, tokens, (s0, s1), jnp.zeros((b, img, img, 1)))

    def merge(*trees):
        out = {}
        for t in trees:
            for k, v in t.items():
                if k in out and isinstance(out[k], dict):
                    out[k] = merge(out[k], v)
                else:
                    out[k] = v
        return out

    return {"params": merge(*(v["params"] for v in (v2, v3, v1, v4, v5)))}
