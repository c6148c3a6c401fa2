"""Segmentation head parity vs the reference UniversalSegmentationHead."""

import numpy as np
import torch

import jax.numpy as jnp

from _reference import ref_module

RNG = np.random.default_rng(61)
D = 64


def test_seg_head_parity():
    seg_mod = ref_module("model.maskformer_segmentation")
    torch.manual_seed(0)
    pixel_decoder = seg_mod.PixelDecoder(
        num_upsampling_stages=3, interpolation_mode="nearest", hidden_dim=D
    )
    cross = torch.nn.MultiheadAttention(D, 4, dropout=0.0)
    ref = seg_mod.UniversalSegmentationHead(
        hidden_dim=D, upsampling_stages=3, aux_masks=False, presence_head=False,
        dot_product_scorer=None, act_ckpt=False, cross_attend_prompt=cross,
        pixel_decoder=pixel_decoder,
    ).eval()

    from efficientsam3_tpu.utils.convert_model import convert_seg_head

    sd = {f"s.{k}": v for k, v in ref.state_dict().items()}
    params, _ = convert_seg_head(sd, "s", num_stages=2)

    b, h, w, nq, t = 2, 4, 4, 5, 3
    # FPN levels fine -> coarse: [4x, 2x, 1x]
    f0 = RNG.standard_normal((b, D, 4 * h, 4 * w)).astype(np.float32)
    f1 = RNG.standard_normal((b, D, 2 * h, 2 * w)).astype(np.float32)
    f2 = RNG.standard_normal((b, D, h, w)).astype(np.float32)
    enc = RNG.standard_normal((h * w, b, D)).astype(np.float32)  # seq-first
    queries = RNG.standard_normal((1, b, nq, D)).astype(np.float32)
    prompt = RNG.standard_normal((t, b, D)).astype(np.float32)
    prompt_mask = np.zeros((b, t), bool)
    prompt_mask[1, 2] = True

    with torch.no_grad():
        out_t = ref(
            backbone_feats=[torch.from_numpy(f0), torch.from_numpy(f1),
                            torch.from_numpy(f2)],
            obj_queries=torch.from_numpy(queries),
            image_ids=torch.arange(b, dtype=torch.long),
            encoder_hidden_states=torch.from_numpy(enc),
            prompt=torch.from_numpy(prompt),
            prompt_mask=torch.from_numpy(prompt_mask),
        )

    from efficientsam3_tpu.models.seg_head import UniversalSegmentationHead

    mine = UniversalSegmentationHead(hidden_dim=D, num_heads=4)

    def nhwc(x):
        return jnp.asarray(x.transpose(0, 2, 3, 1))

    got = mine.apply(
        {"params": params},
        [nhwc(f0), nhwc(f1), nhwc(f2)],
        jnp.asarray(queries[0]),
        jnp.asarray(enc.transpose(1, 0, 2)),
        jnp.asarray(prompt.transpose(1, 0, 2)),
        jnp.asarray(prompt_mask),
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_masks"]), out_t["pred_masks"].numpy(),
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["semantic_seg"]).transpose(0, 3, 1, 2),
        out_t["semantic_seg"].numpy(),
        atol=1e-3, rtol=1e-3,
    )
