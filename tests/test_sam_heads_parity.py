"""Numerical parity of flax SAM heads vs reference torch modules.

Strategy: build the reference torch module with random init, convert its
state_dict with utils/torch_convert, run both on the same inputs, compare.
This is the checkpoint-compatibility guarantee for released weights.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from efficientsam3_tpu.models.sam import MaskDecoder, PromptEncoder, TwoWayTransformer
from efficientsam3_tpu.utils import torch_convert as tc

from _reference import ref_module

RNG = np.random.default_rng(1)
D = 64  # small dim for fast CPU compile; structure identical to d=256


@pytest.fixture(scope="module")
def ref_sam():
    return (
        ref_module("sam.prompt_encoder"),
        ref_module("sam.transformer"),
        ref_module("sam.mask_decoder"),
    )


def test_prompt_encoder_parity(ref_sam):
    pe_mod, _, _ = ref_sam
    torch.manual_seed(0)
    ref = pe_mod.PromptEncoder(
        embed_dim=D, image_embedding_size=(12, 12), input_image_size=(168, 168),
        mask_in_chans=16,
    ).eval()
    sd = {f"pe.{k}": v for k, v in ref.state_dict().items()}
    params = tc.convert_prompt_encoder(sd, p="pe")
    mine = PromptEncoder(
        embed_dim=D, image_embedding_size=(12, 12), input_image_size=(168, 168)
    )

    pts = RNG.random((2, 3, 2)).astype(np.float32) * 168
    labels = np.array([[1, 0, -1], [2, 3, 1]], np.int32)
    with torch.no_grad():
        sparse_t, dense_t = ref(
            (torch.from_numpy(pts), torch.from_numpy(labels)), None, None
        )
    # the reference appends a (0,0,-1) padding point when no boxes are given
    # (prompt_encoder.py:83-86); our fixed-width API takes pre-padded arrays
    pts_pad = np.concatenate([pts, np.zeros((2, 1, 2), np.float32)], axis=1)
    labels_pad = np.concatenate([labels, -np.ones((2, 1), np.int32)], axis=1)
    sparse_j, dense_j = mine.apply(
        {"params": params}, jnp.asarray(pts_pad), jnp.asarray(labels_pad)
    )
    np.testing.assert_allclose(
        np.asarray(sparse_j), sparse_t.detach().numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dense_j).transpose(0, 3, 1, 2),
        dense_t.detach().numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    # dense PE grid
    pe_t = ref.get_dense_pe().detach().numpy()
    pe_j = mine.apply({"params": params}, method=PromptEncoder.dense_pe)
    np.testing.assert_allclose(
        np.asarray(pe_j).transpose(2, 0, 1)[None], pe_t, atol=2e-5, rtol=1e-4
    )
    # mask embedding path
    masks = RNG.standard_normal((2, 1, 48, 48)).astype(np.float32)
    with torch.no_grad():
        _, dense_m = ref(
            (torch.from_numpy(pts), torch.from_numpy(labels)),
            None,
            torch.from_numpy(masks),
        )
    _, dense_mj = mine.apply(
        {"params": params},
        jnp.asarray(pts),
        jnp.asarray(labels),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(dense_mj).transpose(0, 3, 1, 2), dense_m.numpy(), atol=2e-5, rtol=1e-4
    )


def test_mask_decoder_parity(ref_sam):
    _, tr_mod, md_mod = ref_sam
    torch.manual_seed(1)
    ref = md_mod.MaskDecoder(
        transformer_dim=D,
        transformer=tr_mod.TwoWayTransformer(
            depth=2, embedding_dim=D, mlp_dim=128, num_heads=4
        ),
        num_multimask_outputs=3,
        iou_head_depth=3,
        iou_head_hidden_dim=D,
        use_high_res_features=True,
        iou_prediction_use_sigmoid=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
    ).eval()
    sd = {f"md.{k}": v for k, v in ref.state_dict().items()}
    params = tc.convert_mask_decoder(sd, p="md")

    mine = MaskDecoder(
        transformer_dim=D,
        iou_head_hidden_dim=D,
        transformer_mlp_dim=128,
        transformer_num_heads=4,
    )

    b, h, w = 2, 8, 8
    img = RNG.standard_normal((b, D, h, w)).astype(np.float32)
    pe = RNG.standard_normal((1, D, h, w)).astype(np.float32)
    sparse = RNG.standard_normal((b, 3, D)).astype(np.float32)
    dense = RNG.standard_normal((b, D, h, w)).astype(np.float32)
    s0 = RNG.standard_normal((b, D // 8, 4 * h, 4 * w)).astype(np.float32)
    s1 = RNG.standard_normal((b, D // 4, 2 * h, 2 * w)).astype(np.float32)

    with torch.no_grad():
        masks_t, iou_t, tok_t, obj_t = ref(
            torch.from_numpy(img),
            torch.from_numpy(pe),
            torch.from_numpy(sparse),
            torch.from_numpy(dense),
            multimask_output=True,
            repeat_image=False,
            high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
        )

    def nhwc(x):
        return jnp.asarray(x.transpose(0, 2, 3, 1))

    masks_j, iou_j, tok_j, obj_j = mine.apply(
        {"params": params},
        nhwc(img),
        nhwc(pe),
        jnp.asarray(sparse),
        nhwc(dense),
        True,
        (nhwc(s0), nhwc(s1)),
    )
    np.testing.assert_allclose(np.asarray(masks_j), masks_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou_j), iou_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tok_j), tok_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(obj_j), obj_t.numpy(), atol=2e-5, rtol=1e-4)

    # single-mask path with dynamic stability selection
    with torch.no_grad():
        masks_t1, iou_t1, _, _ = ref(
            torch.from_numpy(img),
            torch.from_numpy(pe),
            torch.from_numpy(sparse),
            torch.from_numpy(dense),
            multimask_output=False,
            repeat_image=False,
            high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
        )
    masks_j1, iou_j1, _, _ = mine.apply(
        {"params": params},
        nhwc(img), nhwc(pe), jnp.asarray(sparse), nhwc(dense), False,
        (nhwc(s0), nhwc(s1)),
    )
    np.testing.assert_allclose(np.asarray(masks_j1), masks_t1.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou_j1), iou_t1.numpy(), atol=2e-5, rtol=1e-4)
