"""Parity: fusion encoder layer, text towers, DETR decoder vs reference torch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference import install_torchvision_stub, ref_module

D = 64


def _rng(seed):
    return np.random.default_rng(seed)


def _mha(d, heads, dropout=0.0, batch_first=True):
    return torch.nn.MultiheadAttention(d, heads, dropout=dropout, batch_first=batch_first)


def test_fusion_encoder_layer_parity():
    RNG = _rng(21)
    enc_mod = ref_module("model.encoder")
    torch.manual_seed(0)
    ref = enc_mod.TransformerEncoderLayer(
        activation="relu", d_model=D, dim_feedforward=128, dropout=0.0,
        pos_enc_at_attn=True, pos_enc_at_cross_attn_keys=False,
        pos_enc_at_cross_attn_queries=False, pre_norm=True,
        self_attention=_mha(D, 4), cross_attention=_mha(D, 4),
    ).eval()
    from efficientsam3_tpu.utils.convert_model import _fusion_layer

    sd = {f"l.{k}": v for k, v in ref.state_dict().items()}
    params = _fusion_layer(sd, "l")

    from efficientsam3_tpu.models.fusion_encoder import FusionEncoderLayer

    mine = FusionEncoderLayer(D, 128, 4, 0.0)
    tgt = RNG.standard_normal((2, 9, D)).astype(np.float32)
    mem = RNG.standard_normal((2, 5, D)).astype(np.float32)
    pos = RNG.standard_normal((2, 9, D)).astype(np.float32)
    pad = np.zeros((2, 5), bool)
    pad[1, 3:] = True
    with torch.no_grad():
        want = ref(
            torch.from_numpy(tgt), torch.from_numpy(mem),
            memory_key_padding_mask=torch.from_numpy(pad),
            query_pos=torch.from_numpy(pos),
        ).numpy()
    got = np.asarray(
        mine.apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(mem),
            query_pos=jnp.asarray(pos),
            memory_key_padding_mask=jnp.asarray(pad),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_teacher_text_encoder_parity():
    RNG = _rng(22)
    te_mod = ref_module("model.text_encoder_ve")
    torch.manual_seed(1)

    class TokStub:
        def __call__(self, texts, context_length):
            raise NotImplementedError

    ref = te_mod.VETextEncoder(
        tokenizer=TokStub(), d_model=32, width=D, heads=4, layers=2,
        context_length=16,
    ).eval()
    from efficientsam3_tpu.utils.convert_model import convert_ve_text_encoder

    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    params, _ = convert_ve_text_encoder(sd, "t", layers=2)

    tokens = np.zeros((2, 16), np.int64)
    tokens[0, :5] = [49406, 320, 1125, 539, 49407]
    tokens[1, :3] = [49406, 777, 49407]
    with torch.no_grad():
        _, want_tokens = ref.encoder(torch.from_numpy(tokens))
        want = ref.resizer(want_tokens).numpy()

    from efficientsam3_tpu.models.text_encoder import VETextEncoder

    mine = VETextEncoder(d_model=32, context_length=16, width=D, heads=4, layers=2)
    got, mask = mine.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(mask), tokens == 0)


@pytest.mark.parametrize("backbone", ["MobileCLIP-S0", "MobileCLIP-S1"])
def test_mobileclip_student_parity(backbone):
    RNG = _rng(23)
    from _reference import install_ftfy_stub, install_iopath_stub, install_timm_stub

    install_torchvision_stub()
    install_timm_stub()
    install_ftfy_stub()
    install_iopath_stub()
    ts_mod = ref_module("model.text_encoder_student")
    torch.manual_seed(2)
    from efficientsam3_tpu.models.mobile_clip import MOBILECLIP_TEXT_CFGS

    jcfg = MOBILECLIP_TEXT_CFGS[backbone]
    cfg = {
        "context_length": 16,
        "vocab_size": 49408,
        "dim": 64,
        "ffn_multiplier_per_layer": 4.0,
        "n_heads_per_layer": 4,
        "n_transformer_layers": 2,
        "norm_layer": "layer_norm_fp32",
        "causal_masking": jcfg["causal"],
        "model_name": jcfg["variant"],
        "embed_dropout": 0.0,
        "no_scale_embedding": False,
        "no_pos_embedding": False,
    }
    ref = ts_mod.TextStudentEncoder(
        cfg=cfg, context_length=16, output_dim=32,
        bpe_path="/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
    ).eval()
    # randomize BN running stats in RepMixer blocks
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.7, 1.4)
    from efficientsam3_tpu.utils.convert_model import convert_mobileclip_text

    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    params, stats = convert_mobileclip_text(sd, "t", layers=2, variant=jcfg["variant"])

    tokens = np.zeros((2, 16), np.int64)
    tokens[0, :5] = [49406, 320, 1125, 539, 49407]
    tokens[1, :3] = [49406, 777, 49407]
    with torch.no_grad():
        emb = ref.encoder.forward_embedding(torch.from_numpy(tokens))
        feats = ref.encoder(emb, return_all_tokens=True, input_is_embeddings=True)
        want = ref.projector(feats).numpy()

    import dataclasses

    from efficientsam3_tpu.models.mobile_clip import TextStudentEncoder

    # build a tiny variant matching the test cfg
    from efficientsam3_tpu.models import mobile_clip as mc

    mc_cfgs = dict(mc.MOBILECLIP_TEXT_CFGS)
    mc_cfgs[backbone] = dict(
        dim=64, layers=2, heads=4, variant=jcfg["variant"], causal=jcfg["causal"]
    )
    orig = mc.MOBILECLIP_TEXT_CFGS
    mc.MOBILECLIP_TEXT_CFGS = mc_cfgs
    try:
        mine = TextStudentEncoder(
            backbone_type=backbone, context_length=16, output_dim=32
        )
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        got, mask = mine.apply(variables, jnp.asarray(tokens, jnp.int32))
    finally:
        mc.MOBILECLIP_TEXT_CFGS = orig
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_decoder_parity():
    RNG = _rng(24)
    install_torchvision_stub()
    dec_mod = ref_module("model.decoder")
    torch.manual_seed(3)
    layer = dec_mod.TransformerDecoderLayer(
        activation="relu", d_model=D, dim_feedforward=128, dropout=0.0,
        cross_attention=torch.nn.MultiheadAttention(D, 4, dropout=0.0),
        n_heads=4, use_text_cross_attention=True,
    )
    ref = dec_mod.TransformerDecoder(
        d_model=D, frozen=False, interaction_layer=None, layer=layer,
        num_layers=2, num_queries=6, return_intermediate=True, box_refine=True,
        num_o2m_queries=0, dac=True, boxRPB="log", dac_use_selfatt_ln=True,
        use_act_checkpoint=False, presence_token=True, resolution=64, stride=8,
    ).eval()
    from efficientsam3_tpu.utils.convert_model import convert_decoder

    sd = {f"d.{k}": v for k, v in ref.state_dict().items()}
    params = convert_decoder(sd, "d", num_layers=2)[0]

    b, hw, t = 2, 64, 5
    memory = RNG.standard_normal((hw, b, D)).astype(np.float32)
    pos = RNG.standard_normal((hw, b, D)).astype(np.float32)
    text = RNG.standard_normal((t, b, D)).astype(np.float32)
    text_mask = np.zeros((b, t), bool)
    text_mask[1, 3:] = True
    tgt = (
        ref.query_embed.weight.detach().numpy()[:, None]
        .repeat(b, axis=1)
        .astype(np.float32)
    )
    with torch.no_grad():
        hs_t, refs_t, presence_t, _ = ref(
            tgt=torch.from_numpy(tgt),
            memory=torch.from_numpy(memory),
            pos=torch.from_numpy(pos),
            spatial_shapes=torch.tensor([[8, 8]]),
            valid_ratios=torch.ones(b, 1, 2),
            memory_text=torch.from_numpy(text),
            text_attention_mask=torch.from_numpy(text_mask),
            apply_dac=True,
        )

    from efficientsam3_tpu.models.decoder import TransformerDecoder

    mine = TransformerDecoder(
        num_layers=2, num_queries=6, d_model=D, dim_feedforward=128, num_heads=4,
        dropout=0.0,
    )
    out = mine.apply(
        {"params": params},
        jnp.asarray(memory.transpose(1, 0, 2)),
        (8, 8),
        memory_pos=jnp.asarray(pos.transpose(1, 0, 2)),
        memory_text=jnp.asarray(text.transpose(1, 0, 2)),
        text_key_padding_mask=jnp.asarray(text_mask),
        apply_dac=True,
    )
    # torch returns seq-first (L, NQ, B, ...) -> compare batch-first
    np.testing.assert_allclose(
        np.asarray(out["hs"]), hs_t.permute(0, 2, 1, 3).numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["references"]), refs_t.permute(0, 2, 1, 3).numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["presence_logits"]),
        presence_t.squeeze(-1).squeeze(1).numpy() if presence_t.ndim == 3 else presence_t.numpy(),
        atol=5e-4, rtol=1e-3,
    )
