"""Shared nn primitives (flax.linen, NHWC / (B, N, C) layouts).

Numerics match the reference's torch modules so released checkpoints convert
losslessly (see efficientsam3_tpu/utils/torch_convert.py). Citations point at
the torch definitions these mirror:
  - MLP / MLPBlock / LayerNorm2d: reference sam3/sam3/sam/common.py:9-39,
    sam3/sam3/sam/mask_decoder.py:297, sam3/sam3/model/model_misc.py:160
  - Attention / RoPEAttention: reference sam3/sam3/sam/transformer.py:185,267
  - rope: reference sam3/sam3/sam/rope.py:17-78
  - PositionEmbeddingSine / Random: reference
    sam3/sam3/model/position_encoding.py:10, sam3/sam3/sam/prompt_encoder.py:200

TPU-first notes: attention runs as batched einsums with fp32 softmax
(bf16-safe, MXU-tiled by XLA); rotary encodings are precomputed cos/sin
tables that constant-fold under jit (no complex dtype); sine embeddings are
pure functions of static shapes, so XLA folds them into constants instead of
the reference's Python-side cache.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu_exact(x):
    """torch nn.GELU default (erf form, not tanh approximation)."""
    return jax.nn.gelu(x, approximate=False)


class ConvTranspose2x(nn.Module):
    """2x2-stride-2 transposed conv as one matmul + depth-to-space.

    Drop-in for nn.ConvTranspose(features, (2, 2), strides=(2, 2),
    padding='VALID') — same param tree (kernel (2, 2, I, O), bias (O,)) and
    numerics. With kernel == stride there is no tap overlap, so
    out[2h+i, 2w+j, o] = sum_c x[h, w, c] * kernel[i, j, c, o]: a pure
    (HW, C) @ (C, 4O) matmul the MXU runs at full bf16 rate, where XLA's
    transposed-conv lowering keeps f32 weights through a kernel-rewrite
    custom-call (measured 0.52 ms for the neck's three upsamples vs a
    ~0.17 ms matmul floor).
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        # flax lowers ConvTranspose as a zero-dilated correlation, which
        # reaches kernel tap (1-i, 1-j) for output offset (i, j). Emitting
        # (b, h, i, w, j, o) makes the depth-to-space reshape a pure view —
        # a separate 6-D transpose costs ~0.4 ms/level at the neck shapes.
        y = jnp.einsum("bhwc,ijco->bhiwjo", x, kernel[::-1, ::-1]) + bias
        return y.reshape(b, 2 * h, 2 * w, self.features)


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm replacement backed by a fused Pallas kernel.

    Same parameters ('scale', 'bias') and numerics (fp32 statistics, biased
    variance, eps inside the sqrt) as flax/torch LayerNorm, but one HBM read
    + one write instead of XLA's convert/reduce + normalize fusion pair
    (measured 0.10 ms -> ~0.02 ms per norm over the 5216-token stream).

    `dtype` sets the OUTPUT dtype only. Hot call sites whose consumers are
    bf16 Dense layers pass bf16 here: the consumer casts to bf16 anyway, so
    emitting it directly is numerically identical and skips a convert pass.
    Default (None) emits fp32 like flax nn.LayerNorm with f32 params.
    """

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from efficientsam3_tpu.ops.pallas.layer_norm import layer_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return layer_norm(x, scale, bias, self.epsilon, jnp.dtype(out_dtype))


ACT = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
}


class MLP(nn.Module):
    """Detectron-style MLP: ReLU between layers, optional extras.

    Mirrors reference sam3/sam3/sam/mask_decoder.py:297 (plain) and
    sam3/sam3/model/model_misc.py:160 (dropout/residual/out_norm variant used
    by DotProductScoring).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dropout: float = 0.0
    residual: bool = False
    out_norm: bool = False
    activation: Callable = jax.nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            dim = self.output_dim if is_last else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not is_last:
                x = self.activation(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.residual:
            x = x + inp
        if self.out_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm_ln")(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class MLPBlock(nn.Module):
    """lin1 -> act -> lin2 (reference sam3/sam3/sam/common.py:9)."""

    mlp_dim: int
    activation: Callable = gelu_exact
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = self.activation(x)
        return nn.Dense(d, dtype=self.dtype, name="lin2")(x)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC input (reference sam/common.py:27, eps 1e-6)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = jnp.square(xf - u).mean(-1, keepdims=True)
        xf = (xf - u) * jax.lax.rsqrt(s + self.epsilon)
        return (w * xf + b).astype(x.dtype)


# Large attention shapes route to the Pallas flash kernel: the (Lq, Lk)
# threshold keeps small attentions (decoder queries, text towers, ViT
# windows) on the fused-einsum path where flash overhead would dominate.
# Measured on one v5e chip: the einsum path's fp32 logits round-trip costs
# 6.5 ms/layer at the fusion-encoder shape (1, 8, 5216, 32).
_FLASH_MIN_SCORES = 1 << 22


def _flash_eligible(q, k, mask, bias):
    if bias is not None:  # full (Lq, Lk) biases (boxRPB) stay on einsum
        return False
    if os.environ.get("EFFICIENTSAM3_NO_FLASH"):
        return False
    if q.ndim != 4 or q.shape[-2] * k.shape[-2] < _FLASH_MIN_SCORES:
        return False
    if mask is not None and (
        mask.ndim != 4 or mask.shape[1] != 1 or mask.shape[2] != 1
    ):
        return False  # only key-padding masks map to the kernel's key bias
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def sdpa(q, k, v, mask=None, bias=None):
    """Scaled dot-product attention over (B, H, N, D) with fp32 softmax.

    ``mask``: bool, True = attend. ``bias``: additive logits bias.

    Hot shapes (fusion-encoder self-attention, tracker memory attention)
    dispatch to the flash kernel in ops/pallas/flash_attention.py — same
    numerics (fp32 online softmax, probs cast to v.dtype), no (Lq, Lk)
    logits materialization, masked memory blocks skipped. Set
    EFFICIENTSAM3_NO_FLASH=1 to force the einsum path (e.g. under meshes
    that shard the attention operands — the kernel is single-device).
    """
    d = q.shape[-1]
    if _flash_eligible(q, k, mask, bias):
        from efficientsam3_tpu.ops.pallas.flash_attention import (
            NEG_INF,
            flash_sdpa,
        )

        b, lk = q.shape[0], k.shape[-2]
        if mask is None:
            key_bias = jnp.zeros((b, lk), jnp.float32)
        else:
            key_bias = jnp.where(
                mask[:, 0, 0, :], jnp.float32(0), jnp.float32(NEG_INF)
            )
        return flash_sdpa(q, k, v, key_bias, 1.0 / math.sqrt(d))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def sdpa_rawv(q, k, v_raw, mask=None, return_lse=False):
    """Attention whose VALUES are raw (pre-projection) low-dim tokens.

    q/k (B, H, Lq/Lk, D); v_raw (B, H, Lk, dv) with dv << D. Returns
    (B, H, Lq, dv); the caller applies the value up-projection afterwards
    (exact, because softmax rows sum to 1 — see flash_memattn). Large
    shapes route to the transposed Pallas kernel; fallback is the einsum
    path with the narrow v.

    return_lse: also return the per-query log-sum-exp (B, H, Lq) so the
    caller can merge this segment with another attention segment (the
    cached tracker attends memory bank and pointer tokens separately).

    k may be a (k_i8, k_scale) tuple (flash_attention.quantize_rows) —
    the tracker's opt-in int8 memory bank. On TPU this dispatches to the
    int8 MXU kernel (flash_memattn_q8); the fallback dequantizes k and
    runs the einsum path (kernel-equivalent up to q's own int8 rounding,
    which only the kernel applies)."""
    d = q.shape[-1]
    k_quant = isinstance(k, tuple)
    k_arr = k[0] if k_quant else k
    if _flash_eligible(q, k_arr, mask, None) and v_raw.shape[-1] % 8 == 0:
        from efficientsam3_tpu.ops.pallas.flash_attention import (
            NEG_INF,
            flash_memattn,
            flash_memattn_q8,
        )

        b, lk = q.shape[0], k_arr.shape[-2]
        if mask is None:
            key_bias = jnp.zeros((b, lk), jnp.float32)
        else:
            key_bias = jnp.where(
                mask[:, 0, 0, :], jnp.float32(0), jnp.float32(NEG_INF)
            )
        if k_quant:
            k_i8, k_scale = k
            return flash_memattn_q8(
                q, k_i8, k_scale[:, 0, :, 0], v_raw, key_bias,
                1.0 / math.sqrt(d), return_lse=return_lse,
            )
        return flash_memattn(q, k, v_raw, key_bias, 1.0 / math.sqrt(d),
                             return_lse=return_lse)
    if k_quant:
        k = (k[0].astype(jnp.float32) * k[1]).astype(q.dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", (p / jnp.maximum(l, 1e-30)).astype(v_raw.dtype),
        v_raw,
    )
    if return_lse:
        lse = jnp.where(
            jnp.isfinite(m[..., 0]), m_safe[..., 0] + jnp.log(
                jnp.maximum(l[..., 0], 1e-30)),
            -jnp.inf,
        )
        return out, lse
    return out


def merge_attention_segments(parts):
    """Combine attention outputs over disjoint key segments via their LSEs.

    parts: list of (out (B, H, Lq, dv), lse (B, H, Lq)). Exact softmax
    identity: softmax over the union = LSE-weighted average of segment
    outputs. Fully-masked segments carry lse = -inf and drop out; if ALL
    segments are masked the result is 0 (such query rows are slot-gated
    by callers)."""
    ls = jnp.stack([l for _, l in parts])  # (P, B, H, Lq)
    m = jnp.max(ls, axis=0)
    m_safe = jnp.where(m > jnp.finfo(jnp.float32).min / 2, m, 0.0)
    ws = [jnp.exp(l - m_safe)[..., None] for _, l in parts]
    den = sum(ws)
    num = sum(o.astype(jnp.float32) * w for (o, _), w in zip(parts, ws))
    out = num / jnp.maximum(den, 1e-30)
    return out.astype(parts[0][0].dtype)


def split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class Attention(nn.Module):
    """SAM-style attention with projection downsampling.

    Mirrors reference sam3/sam3/sam/transformer.py:185 — separate
    q/k/v/out linear layers, optional kv input dim, internal dim =
    embedding_dim // downsample_rate.

    setup-style (not @nn.compact) so subclasses can expose extra entry
    points over the same parameters — the tracker's cached memory
    cross-attention projects the bank's k/v once at encode time
    (RoPEAttention.project_kv) and attends per frame (attend_projected).
    """

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @property
    def internal_dim(self):
        return self.embedding_dim // self.downsample_rate

    def setup(self):
        self.q_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.k_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.v_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.embedding_dim, dtype=self.dtype)

    def project(self, q, k, v):
        return (
            split_heads(self.q_proj(q), self.num_heads),
            split_heads(self.k_proj(k), self.num_heads),
            split_heads(self.v_proj(v), self.num_heads),
        )

    def output(self, o):
        return self.out_proj(merge_heads(o))

    def __call__(self, q, k, v):
        qh, kh, vh = self.project(q, k, v)
        return self.output(sdpa(qh, kh, vh))


# --------------------------------------------------------------------------
# Rotary position encoding (axial 2D), real-valued.
# --------------------------------------------------------------------------


def compute_axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Axial rope tables; returns (cos, sin) each (end_x*end_y, dim//2).

    Matches reference sam3/sam3/sam/rope.py:24 `compute_axial_cis`: the first
    dim//4 frequency slots encode x position, the rest encode y.
    """
    quarter = dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32) * 4.0 / dim))
    t = jnp.arange(end_x * end_y, dtype=jnp.float32)
    t_x = t % end_x
    t_y = jnp.floor(t / end_x)
    ang_x = jnp.outer(t_x, freqs)
    ang_y = jnp.outer(t_y, freqs)
    ang = jnp.concatenate([ang_x, ang_y], axis=-1)  # (N, dim//2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """Rotate adjacent pairs of the last dim: matches torch view_as_complex.

    x: (..., N, D); cos/sin: (N, D//2) broadcast over leading dims.
    """
    x2 = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    ra = a * cos - b * sin
    rb = a * sin + b * cos
    out = jnp.stack([ra, rb], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class RoPEAttention(Attention):
    """Attention with axial rotary encoding on q/k.

    Mirrors reference sam3/sam3/sam/transformer.py:267. ``rope_k_repeat``
    tiles the frequency table along k's sequence (cross-attention to a
    memory bank of repeated spatial maps); ``num_k_exclude_rope`` skips the
    trailing k tokens (object pointers) — here a static int so shapes stay
    fixed under jit.
    """

    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    feat_sizes: tuple = (64, 64)

    def _rope_tables(self, grid_tokens: int):
        head_dim = self.internal_dim // self.num_heads
        side = int(round(math.sqrt(grid_tokens)))
        return compute_axial_rope_cos_sin(head_dim, side, side, self.rope_theta)

    def project_kv(self, k, v, grid_tokens: int, num_k_exclude_rope: int = 0):
        """k/v projection + rotary encoding of the keys, no attention.

        The tracker's memory bank changes by at most one entry per frame, so
        these per-layer projections are computed once per entry at
        encode-memory time and cached (video/tracker.py encode_memory_kv);
        the rotation per position is frame-invariant (rope_k_repeat tiles the
        same table for every bank slot). grid_tokens: the query grid length
        the rope table is built for (Hf*Wf).
        """
        kh = split_heads(self.k_proj(k), self.num_heads)
        vh = split_heads(self.v_proj(v), self.num_heads)
        cos, sin = self._rope_tables(grid_tokens)
        n_k = kh.shape[-2]
        num_k_rope = n_k - num_k_exclude_rope
        if num_k_rope != grid_tokens:
            assert self.rope_k_repeat, "k/q length mismatch requires rope_k_repeat"
            r = num_k_rope // grid_tokens
            cos_k = jnp.tile(cos, (r, 1))
            sin_k = jnp.tile(sin, (r, 1))
        else:
            cos_k, sin_k = cos, sin
        if num_k_rope > 0:
            k_rope = apply_rope(kh[..., :num_k_rope, :], cos_k, sin_k)
            kh = jnp.concatenate([k_rope, kh[..., num_k_rope:, :]], axis=-2)
        return kh, vh

    def attend_projected(self, q, kh, vh, key_padding_mask=None):
        """Query projection + rope + attention over pre-projected k/v heads."""
        qh = split_heads(self.q_proj(q), self.num_heads)
        n_q = qh.shape[-2]
        cos, sin = self._rope_tables(n_q)
        qh = apply_rope(qh, cos, sin)
        mask = None
        if key_padding_mask is not None:
            # True = PAD (torch convention); invalid memory-bank slots
            mask = ~key_padding_mask[:, None, None, :]
        return self.output(sdpa(qh, kh, vh, mask=mask))

    def attend_projected_rawv(self, q, kh, v_raw, key_padding_mask=None):
        """Attention over cached keys and RAW (kv_in_dim) values.

        v = v_proj(x) is a linear image of the kv_in_dim-dim tokens and
        softmax rows sum to 1, so A @ v_proj(x) == v_proj(A @ x): the
        64->internal up-projection is applied ONCE per query after the
        attention instead of once per key — 4x fewer AV FLOPs at the
        tracker's memory shape, and the value side of the bank cache
        stays kv_in_dim wide. Single-head only (v_proj's output is not
        split across heads)."""
        assert self.num_heads == 1, "rawv path requires a single head"
        qh = split_heads(self.q_proj(q), self.num_heads)
        cos, sin = self._rope_tables(qh.shape[-2])
        qh = apply_rope(qh, cos, sin)
        mask = None
        if key_padding_mask is not None:
            mask = ~key_padding_mask[:, None, None, :]
        o = sdpa_rawv(qh, kh, v_raw, mask=mask)  # (B, 1, Lq, kv_in_dim)
        return self.out_proj(self.v_proj(merge_heads(o)))

    def attend_projected_rawv_2seg(
        self, q, kh_mem, v_mem, mem_mask, kh_ptr, v_ptr, ptr_mask
    ):
        """attend_projected_rawv over TWO disjoint key segments, merged by
        log-sum-exp — the cached tracker's memory bank (~36k keys, flash
        kernel) and the object-pointer tokens (~64 keys, einsum). Exact:
        softmax over a concatenation equals the LSE-weighted combination of
        per-segment attentions. Avoids concatenating the pointer keys onto
        the ~148 MB/layer bank (measured ~1.8 ms/frame of pure copies).

        Masks follow the torch convention (True = PAD)."""
        assert self.num_heads == 1, "rawv path requires a single head"
        qh = split_heads(self.q_proj(q), self.num_heads)
        cos, sin = self._rope_tables(qh.shape[-2])
        qh = apply_rope(qh, cos, sin)
        o1, l1 = sdpa_rawv(
            qh, kh_mem, v_mem, mask=~mem_mask[:, None, None, :],
            return_lse=True,
        )
        o2, l2 = sdpa_rawv(
            qh, kh_ptr, v_ptr, mask=~ptr_mask[:, None, None, :],
            return_lse=True,
        )
        o = merge_attention_segments([(o1, l1), (o2, l2)])
        return self.out_proj(self.v_proj(merge_heads(o)))

    def __call__(self, q, k, v, num_k_exclude_rope: int = 0, key_padding_mask=None):
        kh, vh = self.project_kv(
            k, v, q.shape[-2], num_k_exclude_rope=num_k_exclude_rope
        )
        return self.attend_projected(q, kh, vh, key_padding_mask=key_padding_mask)


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-parity module (batch-first, same dims).

    The converter splits torch's packed in_proj_weight into q/k/v here.
    Supports additive attention masks and key padding masks.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, attn_mask=None,
                 rpb=None, rpb_kernel=True):
        """key_padding_mask: (B, Nk) bool, True = PAD (torch convention).

        attn_mask: additive float (..., Nq, Nk) or bool (True = masked).

        rpb: optional decomposed boxRPB bias (ey, ex, (h, w)) with
        ey (B, heads, Nq, h), ex (B, heads, Nq, w) f32 and Nk == h*w, such
        that bias[..., q, y*w+x] = ey[..., q, y] + ex[..., q, x]. On TPU at
        inference this dispatches to a Pallas kernel that reconstitutes
        bias tiles in VMEM (the materialized bias is ~532 MB/layer at
        batch 8); otherwise the full bias is built for the einsum path.
        Pass rpb_kernel=False to force the einsum path (training needs
        gradients; the kernel is forward-only).
        """
        qp = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(v)
        qh = split_heads(qp, self.num_heads)
        kh = split_heads(kp, self.num_heads)
        vh = split_heads(vp, self.num_heads)
        if rpb is not None:
            assert attn_mask is None and key_padding_mask is None
            ey, ex, feat_hw = rpb
            if (
                rpb_kernel
                and not os.environ.get("EFFICIENTSAM3_NO_FLASH")
                and jax.default_backend() == "tpu"
            ):
                from efficientsam3_tpu.ops.pallas.flash_attention import (
                    flash_xattn_rpb,
                )

                out = flash_xattn_rpb(
                    qh, kh, vh, ey, ex, feat_hw,
                    1.0 / math.sqrt(qh.shape[-1]),
                )
                return nn.Dense(
                    self.embed_dim, dtype=self.dtype, name="out_proj"
                )(merge_heads(out))
            attn_mask = (
                ey[..., :, None] + ex[..., None, :]
            ).reshape(*ey.shape[:3], feat_hw[0] * feat_hw[1])
        mask = None
        bias = None
        if key_padding_mask is not None:
            mask = ~key_padding_mask[:, None, None, :]
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                am = ~attn_mask
                mask = am if mask is None else (mask & am)
            else:
                bias = attn_mask
        out = sdpa(qh, kh, vh, mask=mask, bias=bias)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(
            merge_heads(out)
        )


# --------------------------------------------------------------------------
# Position embeddings
# --------------------------------------------------------------------------


def sine_pos_embed_2d(
    h: int,
    w: int,
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """(H, W, num_pos_feats) sine embedding, reference position_encoding.py:90.

    Pure function of static shapes -> constant-folded by XLA under jit.
    """
    npf = num_pos_feats // 2
    if scale is None:
        scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(npf, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_encode_xy(x, y, num_pos_feats: int = 256, temperature: float = 10000.0):
    """1D sine encodings of normalized coords (position_encoding.py:53).

    x, y: (...,) normalized to [0,1]. Returns (pos_x, pos_y) each (..., npf).
    """
    npf = num_pos_feats // 2
    scale = 2 * math.pi
    xe = x * scale
    ye = y * scale
    dim_t = jnp.arange(npf, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px = xe[..., None] / dim_t
    py = ye[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1).reshape(
        *x.shape, npf
    )
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1).reshape(
        *y.shape, npf
    )
    return px, py


def sine_encode_boxes(x, y, w, h, num_pos_feats: int = 256):
    """(..., 2*npf + 2) box encoding (position_encoding.py:73)."""
    px, py = sine_encode_xy(x, y, num_pos_feats)
    return jnp.concatenate([py, px, h[..., None], w[..., None]], axis=-1)


def sine_encode_points(x, y, labels, num_pos_feats: int = 256):
    """(..., 2*npf + 1) point encoding (position_encoding.py:81)."""
    px, py = sine_encode_xy(x, y, num_pos_feats)
    return jnp.concatenate([py, px, labels[..., None].astype(px.dtype)], axis=-1)


class PositionEmbeddingRandom(nn.Module):
    """Random-fourier point/grid encoding (sam/prompt_encoder.py:200)."""

    num_pos_feats: int = 64
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords: (..., 2) in [0, 1] -> (..., 2 * num_pos_feats)."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )
        c = 2.0 * coords.astype(jnp.float32) - 1.0
        # K=2 contraction expanded elementwise: exact in fp32 and cheaper
        # than a degenerate (.., 2) @ (2, F) matmul on both TPU and CPU.
        c = c[..., 0:1] * gauss[0] + c[..., 1:2] * gauss[1]
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, h: int, w: int) -> jnp.ndarray:
        """(H, W, C) dense embedding over the pixel-center grid."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (h, w)), jnp.broadcast_to(ys[:, None], (h, w))],
            axis=-1,
        )
        return self(grid)


class DropPath(nn.Module):
    """Stochastic depth per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
