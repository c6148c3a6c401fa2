"""MobileCLIP text towers (LiteText students) in flax.

Mirrors reference sam3/sam3/backbones/mobile_clip.py and
sam3/sam3/model/text_encoder_student.py: token embedding + learnable
positional embedding, then either
  - 'base': N pre-norm transformer encoder layers (fp32 LayerNorm), or
  - 'mct':  RepMixerBlock + N transformer layers + RepMixerBlock, where
    RepMixer mixes tokens with re-parameterizable (1,k) depthwise convs
    (MobileOne blocks) along the sequence axis,
final fp32 LayerNorm, and a linear projector to SAM3's d_model=256.

Variant configs follow model_builder.py:499-556 (S0 = mct/4 layers,
S1/S2 = base/12 layers dim 512, 2-L = base/12 layers dim 768,
B = causal base/12).

TPU notes: sequences are tiny (ctx 16/32/77) — the whole tower is one fused
program. RepMixer runs in NHWC as (B, 1, L, D) with (1, k) depthwise convs.
Position-embedding truncation (ctx 77 -> 16/32) is a pure param-tree slice
(utils: truncate_pos_embed) instead of the reference's in-place Parameter
surgery.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.models.common import gelu_exact, split_heads, merge_heads


MOBILECLIP_TEXT_CFGS = {
    # model_builder.py:503-546
    "MobileCLIP-S0": dict(dim=512, layers=4, heads=8, variant="mct", causal=False),
    "MobileCLIP-S1": dict(dim=512, layers=12, heads=8, variant="base", causal=False),
    "MobileCLIP2-S0": dict(dim=512, layers=12, heads=8, variant="base", causal=False),
    "MobileCLIP2-S2": dict(dim=512, layers=12, heads=8, variant="base", causal=False),
    "MobileCLIP-B": dict(dim=512, layers=12, heads=8, variant="base", causal=True),
    "MobileCLIP2-S3": dict(dim=768, layers=12, heads=12, variant="base", causal=False),
    "MobileCLIP2-S4": dict(dim=768, layers=12, heads=12, variant="base", causal=False),
    "MobileCLIP2-L": dict(dim=768, layers=12, heads=12, variant="base", causal=False),
}


def ffn_dim(dim: int, mult: float = 4.0) -> int:
    return int(math.ceil(dim * mult / 16.0) * 16.0)


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32 (mobile_clip.py:250), eps 1e-5."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x.astype(jnp.float32)).astype(
            x.dtype
        )


class PackedMHA(nn.Module):
    """MobileCLIP MultiHeadAttention (mobile_clip.py:345): packed qkv."""

    embed_dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_bias=None, key_padding_mask=None):
        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = split_heads(q, self.num_heads) * (self.embed_dim // self.num_heads) ** -0.5
        kh = split_heads(k, self.num_heads)
        vh = split_heads(v, self.num_heads)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        )
        if attn_bias is not None:
            logits = logits + attn_bias
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], -jnp.inf, logits
            )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(
            merge_heads(out)
        )


class EncoderLayer(nn.Module):
    """Pre-norm MHA + FFN with fp32 LN (mobile_clip.py:427)."""

    dim: int
    heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_bias=None, key_padding_mask=None):
        h = LayerNormFP32(name="norm_mha")(x)
        x = x + PackedMHA(self.dim, self.heads, dtype=self.dtype, name="attn")(
            h, attn_bias, key_padding_mask
        )
        h = LayerNormFP32(name="norm_ffn")(x)
        h = nn.Dense(ffn_dim(self.dim), dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(gelu_exact(h))
        return x + h


class MobileOneBlock1xK(nn.Module):
    """Train-form MobileOne block with (1, k) depthwise kernel over NHWC
    (B, 1, L, D) inputs (mobile_clip.py:48). Branches: optional conv+BN,
    plus identity BN. No scale branch (kernel_size[0] == 1)."""

    k: int
    num_conv_branches: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = x.shape[-1]
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="rbr_skip",
        )(x)
        for i in range(self.num_conv_branches):
            y = nn.Conv(
                d, (1, self.k), padding=(0, self.k // 2), feature_group_count=d,
                use_bias=False, dtype=self.dtype, name=f"rbr_conv_{i}_conv",
            )(x)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"rbr_conv_{i}_bn",
            )(y)
            out = out + y
        return out


class RepMixerBlock(nn.Module):
    """Token mixing + ConvFFN over the sequence axis (mobile_clip.py:647).

    Input/output: (B, L, D).
    """

    # RepMixerBlock passes its kernel_size=11 to BOTH the token mixer and
    # the ConvFFN (mobile_clip.py:647-676)
    kernel_size: int = 11
    ffn_kernel_size: int = 11
    mlp_ratio: float = 4.0
    layer_scale_init: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, **_):
        b, l, d = x.shape
        z = x[:, None]  # (B, 1, L, D) NHWC

        # RepMixer: x + ls * (mixer(x) - norm(x))
        mixer = MobileOneBlock1xK(
            self.kernel_size, 1, dtype=self.dtype, name="token_mixer_mixer"
        )(z, train=train)
        norm = MobileOneBlock1xK(
            self.kernel_size, 0, dtype=self.dtype, name="token_mixer_norm"
        )(z, train=train)
        ls_mix = self.param(
            "token_mixer_layer_scale",
            nn.initializers.constant(self.layer_scale_init),
            (d,),
        )
        z = z + ls_mix * (mixer - norm)

        # ConvFFN: dw (1, 11) conv + BN -> 1x1 expand -> GELU -> 1x1 project
        f = nn.Conv(
            d, (1, self.ffn_kernel_size),
            padding=(0, self.ffn_kernel_size // 2),
            feature_group_count=d, use_bias=False, dtype=self.dtype,
            name="convffn_conv",
        )(z)
        f = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="convffn_bn",
        )(f)
        f = nn.Conv(
            int(d * self.mlp_ratio), (1, 1), dtype=self.dtype, name="convffn_fc1"
        )(f)
        f = nn.Conv(d, (1, 1), dtype=self.dtype, name="convffn_fc2")(gelu_exact(f))
        ls_ffn = self.param(
            "layer_scale", nn.initializers.constant(self.layer_scale_init), (d,)
        )
        z = z + ls_ffn * f
        return z[:, 0]  # (B, L, D)


class MobileCLIPTextTransformer(nn.Module):
    """Tokens -> per-token features (return_all_tokens path)."""

    dim: int = 512
    layers: int = 12
    heads: int = 8
    variant: str = "base"  # 'base' | 'mct'
    causal: bool = False
    context_length: int = 77
    vocab_size: int = 49408
    projection_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, *, train: bool = False):
        b, seq = tokens.shape
        x = nn.Embed(self.vocab_size, self.dim, name="embedding_layer")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.truncated_normal(self.dim**-0.5),
            (self.context_length, self.dim),
        )
        x = x + pos[:seq]

        bias = None
        if self.causal:
            neg = jnp.finfo(jnp.float32).min
            bias = jnp.triu(jnp.full((seq, seq), neg, jnp.float32), k=1)[None, None]

        blocks = []
        if self.variant == "mct":
            blocks.append(("repmixer", "transformer_0"))
            for i in range(self.layers):
                blocks.append(("enc", f"transformer_{1 + i}"))
            blocks.append(("repmixer", f"transformer_{1 + self.layers}"))
        else:
            for i in range(self.layers):
                blocks.append(("enc", f"transformer_{i}"))

        for kind, name in blocks:
            if kind == "repmixer":
                x = RepMixerBlock(dtype=self.dtype, name=name)(x, train=train)
            else:
                x = EncoderLayer(self.dim, self.heads, dtype=self.dtype, name=name)(
                    x, attn_bias=bias
                )
        x = LayerNormFP32(name="final_layer_norm")(x)
        # projection_layer exists in checkpoints but is unused for the SAM3
        # token path (text_encoder_student.py returns all tokens).
        self.param(
            "projection_layer",
            nn.initializers.normal(self.dim**-0.5),
            (self.dim, self.projection_dim or self.dim),
        )
        return x


class TextStudentEncoder(nn.Module):
    """LiteText student: MobileCLIP tower + linear projector to d_model.

    Returns (text_memory (B, L, d_model), pad_mask (B, L) True = pad).
    Mirrors reference sam3/sam3/model/text_encoder_student.py:9.
    """

    backbone_type: str = "MobileCLIP-S0"
    context_length: int = 77
    output_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, *, train: bool = False):
        cfg = MOBILECLIP_TEXT_CFGS[self.backbone_type]
        feats = MobileCLIPTextTransformer(
            dim=cfg["dim"],
            layers=cfg["layers"],
            heads=cfg["heads"],
            variant=cfg["variant"],
            causal=cfg["causal"],
            context_length=self.context_length,
            projection_dim=cfg["dim"],
            dtype=self.dtype,
            name="encoder",
        )(tokens, train=train)
        resized = nn.Dense(self.output_dim, dtype=self.dtype, name="projector")(feats)
        pad_mask = tokens == 0
        return resized, pad_mask


def truncate_pos_embed(params: dict, new_length: int) -> dict:
    """Slice the student tower's positional table to a shorter context
    (reference mobile_clip.py:709 resize_pos_embed, truncation case).

    params: the TextStudentEncoder param subtree (contains 'encoder').
    """
    import copy

    params = copy.deepcopy(params)
    pe = params["encoder"]["positional_embedding"]
    params["encoder"]["positional_embedding"] = pe[:new_length]
    return params
