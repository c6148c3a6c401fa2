"""Geometry encoder parity vs reference (points path; box pooling uses a
static sampling grid by design, so box parity is structural only)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from _reference import install_torchvision_stub, ref_module

RNG = np.random.default_rng(41)
D = 64


def test_geometry_encoder_points_parity():
    install_torchvision_stub()
    ge_mod = ref_module("model.geometry_encoders")
    enc_mod = ref_module("model.encoder")
    pe_mod = ref_module("model.position_encoding")
    torch.manual_seed(0)

    pos_enc = pe_mod.PositionEmbeddingSine(num_pos_feats=D, normalize=True)
    layer = enc_mod.TransformerEncoderLayer(
        activation="relu", d_model=D, dim_feedforward=128, dropout=0.0,
        pos_enc_at_attn=False, pre_norm=True,
        self_attention=torch.nn.MultiheadAttention(D, 4, dropout=0.0),
        pos_enc_at_cross_attn_queries=False, pos_enc_at_cross_attn_keys=True,
        cross_attention=torch.nn.MultiheadAttention(D, 4, dropout=0.0),
    )
    ref = ge_mod.SequenceGeometryEncoder(
        pos_enc=pos_enc, encode_boxes_as_points=False,
        points_direct_project=True, points_pool=True, points_pos_enc=True,
        boxes_direct_project=True, boxes_pool=True, boxes_pos_enc=True,
        d_model=D, num_layers=2, layer=layer, use_act_ckpt=False,
        add_cls=True, add_post_encode_proj=True,
    ).eval()

    from efficientsam3_tpu.utils.convert_model import convert_geometry_encoder

    sd = {f"g.{k}": v for k, v in ref.state_dict().items()}
    params, _ = convert_geometry_encoder(sd, "g", num_layers=2)

    b, h, w = 2, 8, 8
    img = RNG.standard_normal((h * w, b, D)).astype(np.float32)  # seq-first
    img_pos = RNG.standard_normal((h * w, b, D)).astype(np.float32)
    npts = 3
    pts = RNG.random((npts, b, 2)).astype(np.float32)
    pts_mask = np.zeros((b, npts), bool)
    pts_mask[1, 2] = True
    pts_labels = RNG.integers(0, 2, (npts, b))

    # the reference pools boxes through torchvision.ops.roi_align even for
    # zero boxes; give the stub an empty-capable callable
    import torchvision

    def _empty_roi_align(feats, boxes_list, output_size, *a, **k):
        n = sum(len(bx) for bx in boxes_list)
        assert n == 0, "points-only test"
        return torch.zeros(0, feats.shape[1], output_size, output_size)

    _orig_roi_align = torchvision.ops.roi_align
    torchvision.ops.roi_align = _empty_roi_align
    ge_mod.torchvision.ops.roi_align = _empty_roi_align

    try:
        # reference forward with points only (empty boxes)
        prompt = ge_mod.Prompt(
            point_embeddings=torch.from_numpy(pts),
            point_mask=torch.from_numpy(pts_mask),
            point_labels=torch.from_numpy(pts_labels),
            box_embeddings=torch.zeros(0, b, 4),
            box_mask=torch.zeros(b, 0, dtype=torch.bool),
            box_labels=torch.zeros(0, b, dtype=torch.long),
        )
        with torch.no_grad():
            want, want_mask = ref(
                geo_prompt=prompt,
                img_feats=[torch.from_numpy(img)],
                img_sizes=[(h, w)],
                img_pos_embeds=[torch.from_numpy(img_pos)],
            )
    finally:
        # restore the stub's functional roi_align so later tests (e.g.
        # test_ops_parity's stub-vs-oracle check) see the real stub
        torchvision.ops.roi_align = _orig_roi_align
        ge_mod.torchvision.ops.roi_align = _orig_roi_align

    # mine: batch-first, zero-width box slots (masked out)
    from efficientsam3_tpu.models.geometry import Prompt as JPrompt, SequenceGeometryEncoder

    mine = SequenceGeometryEncoder(
        d_model=D, num_layers=2, dropout=0.0, dim_feedforward=128, num_heads=4
    )
    jp = JPrompt(
        boxes=jnp.zeros((b, 0, 4)),
        box_mask=jnp.ones((b, 0), bool),
        box_labels=jnp.zeros((b, 0), jnp.int32),
        points=jnp.asarray(pts.transpose(1, 0, 2)),
        point_mask=jnp.asarray(pts_mask),
        point_labels=jnp.asarray(pts_labels.T.astype(np.int32)),
    )
    got, got_mask = mine.apply(
        {"params": params},
        jp,
        jnp.asarray(img.transpose(1, 0, 2)),
        (h, w),
        jnp.asarray(img_pos.transpose(1, 0, 2)),
    )
    # The reference compacts padded slots to the END of the sequence
    # (concat_padded_sequences), while ours keeps fixed positions with the
    # CLS always last. Compare the VALID tokens + CLS in matching order;
    # masked-slot contents are unconsumed downstream in both.
    got_np = np.asarray(got)
    got_m = np.asarray(got_mask)
    want_np = want.permute(1, 0, 2).numpy()
    want_m = want_mask.numpy()
    for bi in range(b):
        mine_valid = got_np[bi][~got_m[bi]]
        ref_valid = want_np[bi][~want_m[bi]]
        assert mine_valid.shape == ref_valid.shape
        np.testing.assert_allclose(mine_valid, ref_valid, atol=1e-3, rtol=1e-3)
