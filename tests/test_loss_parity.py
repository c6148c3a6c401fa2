"""Loss-stack numerical parity vs the reference Sam3LossWrapper.

Builds the stage-3 loss configuration (Boxes + IABCEMdetr + Masks with deep
supervision, o2m/DAC losses, BinaryHungarianMatcherV2 + BinaryOneToManyMatcher;
configs/stage3/mixed/stage3_mixed_sacap_sa1b_tvm_mcs0_seg_img_fpn.yaml:64-99)
on one fixed synthetic batch and asserts our fixed-shape JAX
sam3_detection_loss reproduces the total weighted loss and every component.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference import (
    install_torchmetrics_stub,
    install_triton_focal_stub,
    ref_module,
)

B, Q, T_MAX = 2, 12, 3
NUM_AUX = 2
H_PRED, W_PRED = 16, 16
H_TGT, W_TGT = 32, 32
WEIGHTS = {
    "loss_ce": 20.0,
    "presence_loss": 20.0,
    "loss_bbox": 5.0,
    "loss_giou": 2.0,
    "loss_mask": 200.0,
    "loss_dice": 10.0,
}
O2M_WEIGHT = 2.0


def _rand_boxes(rng, *shape):
    cx = rng.uniform(0.2, 0.8, shape)
    cy = rng.uniform(0.2, 0.8, shape)
    w = rng.uniform(0.05, 0.3, shape)
    h = rng.uniform(0.05, 0.3, shape)
    return np.stack([cx, cy, w, h], axis=-1).astype(np.float32)


def _make_fixture():
    rng = np.random.default_rng(11)
    num_boxes = np.array([3, 2])  # per-sample target counts (T_MAX padded)
    layers = []
    for _ in range(NUM_AUX + 1):
        layers.append(
            {
                "logits": rng.normal(0, 2, (B, Q, 1)).astype(np.float32),
                "boxes": _rand_boxes(rng, B, Q),
                "logits_o2m": rng.normal(0, 2, (B, Q, 1)).astype(np.float32),
                "boxes_o2m": _rand_boxes(rng, B, Q),
                "presence": rng.normal(0, 1, (B, 1)).astype(np.float32),
            }
        )
    masks = rng.normal(0, 2, (B, Q, H_PRED, W_PRED)).astype(np.float32)
    masks_o2m = rng.normal(0, 2, (B, Q, H_PRED, W_PRED)).astype(np.float32)
    tgt_boxes_padded = _rand_boxes(rng, B, T_MAX)
    tgt_valid = np.arange(T_MAX)[None] < num_boxes[:, None]
    tgt_boxes_padded = tgt_boxes_padded * tgt_valid[..., None]
    tgt_masks_padded = (
        rng.random((B, T_MAX, H_TGT, W_TGT)) > 0.6
    ).astype(np.float32)
    mask_valid = tgt_valid.copy()
    mask_valid[0, 2] = False  # one valid box without a valid mask
    return {
        "layers": layers,
        "masks": masks,
        "masks_o2m": masks_o2m,
        "tgt_boxes_padded": tgt_boxes_padded,
        "tgt_valid": tgt_valid,
        "tgt_masks_padded": tgt_masks_padded,
        "mask_valid": mask_valid,
        "num_boxes": num_boxes,
    }


def _ref_loss(fx):
    install_torchmetrics_stub()
    install_triton_focal_stub()
    matcher_mod = ref_module("train.matcher")
    loss_fns = ref_module("train.loss.loss_fns")
    sam3_loss = ref_module("train.loss.sam3_loss")
    box_ops = ref_module("model.box_ops")

    matcher = matcher_mod.BinaryHungarianMatcherV2(
        focal=True, cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
        alpha=0.25, gamma=2, stable=False,
    )
    o2m_matcher = matcher_mod.BinaryOneToManyMatcher(
        alpha=0.3, threshold=0.4, topk=4
    )
    wrapper = sam3_loss.Sam3LossWrapper(
        loss_fns_find=[
            loss_fns.Boxes(weight_dict={"loss_bbox": 5.0, "loss_giou": 2.0}),
            loss_fns.IABCEMdetr(
                weak_loss=False,
                weight_dict={"loss_ce": 20.0, "presence_loss": 20.0},
                pos_weight=10.0, alpha=0.25, gamma=2,
                use_presence=True, pos_focal=False,
            ),
            loss_fns.Masks(
                focal_alpha=0.25, focal_gamma=2.0,
                weight_dict={"loss_mask": 200.0, "loss_dice": 10.0},
                compute_aux=False,
            ),
        ],
        normalization="local",
        matcher=matcher,
        o2m_matcher=o2m_matcher,
        o2m_weight=O2M_WEIGHT,
        use_o2m_matcher_on_o2m_aux=False,
    )

    tv = torch.from_numpy(fx["tgt_valid"])
    boxes_padded = torch.from_numpy(fx["tgt_boxes_padded"])
    packed_boxes = boxes_padded[tv]  # (sum T, 4)
    masks_packed = torch.from_numpy(fx["tgt_masks_padded"])[tv]
    is_valid_mask = torch.from_numpy(fx["mask_valid"])[tv]
    obj_ids_padded = torch.where(
        tv, torch.arange(T_MAX)[None].expand(B, -1), torch.tensor(-1)
    )
    targets = {
        "boxes": packed_boxes,
        "boxes_xyxy": box_ops.box_cxcywh_to_xyxy(packed_boxes),
        "boxes_padded": boxes_padded,
        "num_boxes": torch.from_numpy(fx["num_boxes"]),
        "masks": masks_packed,
        "is_valid_mask": is_valid_mask,
        "is_exhaustive": torch.ones(B, dtype=torch.bool),
        "object_ids_padded": obj_ids_padded,
    }

    def to_out(layer, final):
        out = {
            "pred_logits": torch.from_numpy(layer["logits"]),
            "pred_boxes": torch.from_numpy(layer["boxes"]),
            "pred_boxes_xyxy": box_ops.box_cxcywh_to_xyxy(
                torch.from_numpy(layer["boxes"])
            ),
            "presence_logit_dec": torch.from_numpy(layer["presence"]),
            "pred_logits_o2m": torch.from_numpy(layer["logits_o2m"]),
            "pred_boxes_o2m": torch.from_numpy(layer["boxes_o2m"]),
            "pred_boxes_xyxy_o2m": box_ops.box_cxcywh_to_xyxy(
                torch.from_numpy(layer["boxes_o2m"])
            ),
        }
        if final:
            out["pred_masks"] = torch.from_numpy(fx["masks"])
            out["pred_masks_o2m"] = torch.from_numpy(fx["masks_o2m"])
        return out

    nested = to_out(fx["layers"][-1], final=True)
    nested["aux_outputs"] = [
        to_out(layer, final=False) for layer in fx["layers"][:-1]
    ]
    # model-computed o2o indices (sam3_image.py:578 _compute_matching)
    nested["indices"] = matcher(nested, targets)
    for aux in nested["aux_outputs"]:
        aux["indices"] = matcher(aux, targets)

    with torch.no_grad():
        losses = wrapper.compute_loss(nested, targets)
    return {k: float(v) for k, v in losses.items()}


def _jax_loss(fx):
    from efficientsam3_tpu.train.losses import sam3_detection_loss

    layers = fx["layers"]
    aux_logits = np.stack(
        [np.concatenate([l["logits"], l["logits_o2m"]], 1) for l in layers[:-1]]
    )
    aux_boxes = np.stack(
        [np.concatenate([l["boxes"], l["boxes_o2m"]], 1) for l in layers[:-1]]
    )
    aux_presence = np.stack([l["presence"] for l in layers[:-1]])
    final = layers[-1]
    outputs = {
        "pred_logits": jnp.asarray(final["logits"]),
        "pred_boxes": jnp.asarray(final["boxes"]),
        "pred_masks": jnp.asarray(fx["masks"]),
        "presence_logit_dec": jnp.asarray(final["presence"]),
        "pred_logits_o2m": jnp.asarray(final["logits_o2m"]),
        "pred_boxes_o2m": jnp.asarray(final["boxes_o2m"]),
        "pred_masks_o2m": jnp.asarray(fx["masks_o2m"]),
        "aux": {
            "pred_logits": jnp.asarray(aux_logits),
            "pred_boxes": jnp.asarray(aux_boxes),
            "presence_logits": jnp.asarray(aux_presence),
        },
    }
    targets = {
        "boxes": jnp.asarray(fx["tgt_boxes_padded"]),
        "valid": jnp.asarray(fx["tgt_valid"]),
        "masks": jnp.asarray(fx["tgt_masks_padded"]),
        "mask_valid": jnp.asarray(fx["mask_valid"]),
    }
    total, parts = jax.jit(
        lambda o, t: sam3_detection_loss(o, t, WEIGHTS, o2m_weight=O2M_WEIGHT)
    )(outputs, targets)
    return float(total), {k: float(v) for k, v in parts.items()}


@pytest.mark.slow
def test_sam3_loss_parity():
    fx = _make_fixture()
    ref = _ref_loss(fx)
    total, parts = _jax_loss(fx)

    # component-level parity (reference keys use _aux_{i} suffixes; o2m keys
    # there look like loss_ce_aux_0_o2m / loss_ce_o2m like ours)
    for key in (
        "loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice",
        "presence_loss",
        "loss_ce_o2m", "loss_bbox_o2m", "loss_giou_o2m",
        "loss_mask_o2m", "loss_dice_o2m",
        "loss_ce_aux_0", "loss_bbox_aux_0", "loss_giou_aux_0",
        "presence_loss_aux_0",
        "loss_ce_aux_1", "loss_bbox_aux_1", "loss_giou_aux_1",
        "loss_ce_aux_0_o2m", "loss_bbox_aux_0_o2m", "loss_giou_aux_0_o2m",
    ):
        assert key in ref, f"reference missing {key}: {sorted(ref)}"
        assert key in parts, f"mine missing {key}: {sorted(parts)}"
        # the reference stores o2m components pre-multiplied by o2m_weight
        # (sam3_loss.py:151-153); ours stores them raw and weights the total
        scale = O2M_WEIGHT if key.endswith("_o2m") else 1.0
        np.testing.assert_allclose(
            parts[key] * scale, ref[key], rtol=2e-4, atol=2e-5, err_msg=key
        )

    np.testing.assert_allclose(total, ref["core_loss"], rtol=2e-4)
