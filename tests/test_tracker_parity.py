"""Tracker components parity: memory attention + memory encoder vs torch."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from _reference import install_timm_stub, install_torchvision_stub, ref_module

RNG = np.random.default_rng(51)
D = 64
MD = 16  # memory dim


def test_memory_attention_parity():
    install_torchvision_stub()
    dec_mod = ref_module("model.decoder")
    tr_mod = ref_module("sam.transformer")
    torch.manual_seed(0)

    self_attn = tr_mod.RoPEAttention(
        embedding_dim=D, num_heads=1, downsample_rate=1, dropout=0.0,
        rope_theta=10000.0, feat_sizes=[4, 4],
    )
    cross_attn = tr_mod.RoPEAttention(
        embedding_dim=D, num_heads=1, downsample_rate=1, dropout=0.0,
        kv_in_dim=MD, rope_theta=10000.0, feat_sizes=[4, 4], rope_k_repeat=True,
    )
    layer = dec_mod.TransformerDecoderLayerv2(
        cross_attention_first=False, activation="relu", dim_feedforward=128,
        dropout=0.0, pos_enc_at_attn=False, pre_norm=True,
        self_attention=self_attn, d_model=D,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        cross_attention=cross_attn,
    )
    ref = dec_mod.TransformerEncoderCrossAttention(
        remove_cross_attention_layers=[], batch_first=True, d_model=D,
        frozen=False, pos_enc_at_input=True, layer=layer, num_layers=2,
        use_act_checkpoint=False,
    ).eval()

    from efficientsam3_tpu.utils.convert_model import convert_memory_attention

    sd = {f"m.{k}": v for k, v in ref.state_dict().items()}
    params, _ = convert_memory_attention(sd, "m", num_layers=2)

    b, hw = 2, 16  # 4x4 image tokens
    n_mem = 2  # two spatial memory frames of 4x4
    n_ptr_tok = 4
    src = RNG.standard_normal((hw, b, D)).astype(np.float32)
    src_pos = RNG.standard_normal((hw, b, D)).astype(np.float32)
    mem_spatial = RNG.standard_normal((n_mem * hw, b, MD)).astype(np.float32)
    mem_pos = RNG.standard_normal((n_mem * hw, b, MD)).astype(np.float32)
    ptr = RNG.standard_normal((n_ptr_tok, b, MD)).astype(np.float32)
    ptr_pos = RNG.standard_normal((n_ptr_tok, b, MD)).astype(np.float32)
    prompt = np.concatenate([mem_spatial, ptr], 0)
    prompt_pos = np.concatenate([mem_pos, ptr_pos], 0)

    with torch.no_grad():
        out_t = ref(
            src=torch.from_numpy(src),
            prompt=torch.from_numpy(prompt),
            src_pos=torch.from_numpy(src_pos),
            prompt_pos=torch.from_numpy(prompt_pos),
            num_obj_ptr_tokens=n_ptr_tok,
        )["memory"].numpy()  # seq-first (hw, b, D)

    from efficientsam3_tpu.models.memory_attention import MemoryAttention

    mine = MemoryAttention(num_layers=2, d_model=D, kv_in_dim=MD, dim_feedforward=128)
    got = mine.apply(
        {"params": params},
        jnp.asarray(src.transpose(1, 0, 2)),
        jnp.asarray(src_pos.transpose(1, 0, 2)),
        jnp.asarray(prompt.transpose(1, 0, 2)),
        jnp.asarray(prompt_pos.transpose(1, 0, 2)),
        None,
        num_obj_ptr_tokens=n_ptr_tok,
    )
    # mine passes FFN at its layer width 2048 default? configure matching
    np.testing.assert_allclose(
        np.asarray(got), out_t.transpose(1, 0, 2), atol=1e-3, rtol=1e-3
    )


def test_memory_encoder_parity():
    install_timm_stub()
    mem_mod = ref_module("model.memory")
    pe_mod = ref_module("model.position_encoding")
    torch.manual_seed(1)
    pos_enc = pe_mod.PositionEmbeddingSine(num_pos_feats=MD, normalize=True)
    downsampler = mem_mod.SimpleMaskDownSampler(
        embed_dim=D, kernel_size=3, stride=2, padding=1, interpol_size=[64, 64],
        total_stride=16,
    )
    cx = mem_mod.CXBlock(dim=D, kernel_size=7, padding=3,
                         layer_scale_init_value=1e-6, use_dwconv=True)
    fuser = mem_mod.SimpleFuser(layer=cx, num_layers=2)
    ref = mem_mod.SimpleMaskEncoder(
        out_dim=MD, position_encoding=pos_enc, mask_downsampler=downsampler,
        fuser=fuser, in_dim=D,
    ).eval()

    from efficientsam3_tpu.models.memory_encoder import MemoryEncoder
    from efficientsam3_tpu.utils.convert_model import convert_memory_encoder

    sd = {f"e.{k}": v for k, v in ref.state_dict().items()}
    params, _ = convert_memory_encoder(sd, "e")

    b, fs = 2, 4  # 64/16
    pix = RNG.standard_normal((b, D, fs, fs)).astype(np.float32)
    masks = RNG.standard_normal((b, 1, 64, 64)).astype(np.float32) * 4
    with torch.no_grad():
        out_t = ref(torch.from_numpy(pix), torch.from_numpy(masks))
        want = out_t["vision_features"].numpy()
        want_pos = out_t["vision_pos_enc"][0].numpy()

    mine = MemoryEncoder(out_dim=MD, in_dim=D, interpol_size=(64, 64))
    got, pos = mine.apply(
        {"params": params},
        jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
        False,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(pos).transpose(2, 0, 1)[None], want_pos[:1], atol=1e-4, rtol=1e-3
    )
