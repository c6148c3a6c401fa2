"""Tracker track_step end-to-end parity vs the reference Sam3TrackerBase.

Drives a 4-frame, 2-object rollout through BOTH stacks on identical
fabricated backbone features:
  frame 0: prompted (1 click per object)  -> no-mem path + SAM heads + memory
  frames 1-3: tracked                     -> memory attention over the growing
              bank (cond frame + recent non-cond + object pointers)
and asserts low-res masks, object pointers, and encoded memories match at
every frame. Reference call path: sam3_tracker_base.py:934 track_step,
:562 _prepare_memory_conditioned_features, :799 _encode_new_memory.

The tracker is built at image_size=252 (feat 18) with the exact builder
component wiring (model_builder.py:331-484) scaled down so the rollout fits
CPU test budgets; all shape-dependent logic is identical to the 1008 config.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference import (
    install_ftfy_stub,
    install_iopath_stub,
    install_omegaconf_stub,
    install_pycocotools_stub,
    install_timm_stub,
    install_torchvision_stub,
    ref_module,
)

IMG = 252
STRIDE = 14
FS = IMG // STRIDE  # 18
NUM_FRAMES = 4
B = 2  # objects


def _build_ref_tracker():
    install_torchvision_stub()
    install_timm_stub()
    install_ftfy_stub()
    install_iopath_stub()
    install_omegaconf_stub()
    install_pycocotools_stub()
    mb = ref_module("model_builder")
    tp_mod = ref_module("model.sam3_tracking_predictor")
    mem_mod = ref_module("model.memory")
    pe_mod = ref_module("model.position_encoding")
    torch.manual_seed(3)

    # builder wiring (model_builder.py:331-364) at interpol 16*FS
    pos_enc = pe_mod.PositionEmbeddingSine(
        num_pos_feats=64, normalize=True, scale=None, temperature=10000,
    )
    mask_down = mem_mod.SimpleMaskDownSampler(
        kernel_size=3, stride=2, padding=1, interpol_size=[16 * FS, 16 * FS]
    )
    cx = mem_mod.CXBlock(
        dim=256, kernel_size=7, padding=3, layer_scale_init_value=1e-6,
        use_dwconv=True,
    )
    fuser = mem_mod.SimpleFuser(layer=cx, num_layers=2)
    maskmem_backbone = mem_mod.SimpleMaskEncoder(
        out_dim=64, position_encoding=pos_enc, mask_downsampler=mask_down,
        fuser=fuser,
    )
    transformer = mb._create_tracker_transformer()
    tracker = tp_mod.Sam3TrackerPredictor(
        image_size=IMG,
        num_maskmem=7,
        backbone=None,
        backbone_stride=STRIDE,
        transformer=transformer,
        maskmem_backbone=maskmem_backbone,
        multimask_output_in_sam=True,
        forward_backbone_per_frame_for_eval=True,
        trim_past_non_cond_mem_for_eval=False,
        multimask_output_for_tracking=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        always_start_from_first_ann_frame=False,
        non_overlap_masks_for_mem_enc=False,
        non_overlap_masks_for_output=False,
        max_cond_frames_in_attn=4,
        offload_output_to_cpu_for_eval=False,
        sam_mask_decoder_extra_args={
            "dynamic_multimask_via_stability": True,
            "dynamic_multimask_stability_delta": 0.05,
            "dynamic_multimask_stability_thresh": 0.98,
        },
        clear_non_cond_mem_around_input=True,
        fill_hole_area=0,
        use_memory_selection=False,
    )
    tracker.eval()
    return tracker


@pytest.mark.slow
def test_track_step_rollout_parity():
    ref = _build_ref_tracker()
    sd = {
        f"inst_interactive_predictor.model.{k}": v
        for k, v in ref.state_dict().items()
    }

    from efficientsam3_tpu.models.common import sine_pos_embed_2d
    from efficientsam3_tpu.utils.convert_model import convert_tracker_core
    from efficientsam3_tpu.video.predictor import TrackerPredictor
    from efficientsam3_tpu.video.tracker import TrackerCore

    core = TrackerCore(image_size=IMG, backbone_stride=STRIDE)
    tparams, _ = convert_tracker_core(sd)
    variables = {"params": tparams}

    # fabricated raw backbone levels per frame (256ch at 4x/2x/1x of FS)
    rng = np.random.default_rng(5)
    raw = [
        (
            rng.normal(0, 0.5, (1, 4 * FS, 4 * FS, 256)).astype(np.float32),
            rng.normal(0, 0.5, (1, 2 * FS, 2 * FS, 256)).astype(np.float32),
            rng.normal(0, 0.5, (1, FS, FS, 256)).astype(np.float32),
        )
        for _ in range(NUM_FRAMES)
    ]
    pos = np.asarray(sine_pos_embed_2d(FS, FS, 256)).reshape(FS * FS, 256)

    def encode_frame(img):
        t = int(np.asarray(img).reshape(-1)[0])  # frame index smuggled in px0
        return {"sam2_fpn": [jnp.asarray(x) for x in raw[t]]}

    pred = TrackerPredictor(core, variables, encode_frame, obj_slots=B)
    frames = np.zeros((NUM_FRAMES, 2, 2, 3), np.float32)
    frames[:, 0, 0, 0] = np.arange(NUM_FRAMES)
    state = pred.init_state(list(frames))

    clicks = np.array([[100.0, 80.0], [180.0, 200.0]], np.float32)
    pred.add_new_points_or_box(state, 0, obj_id=1, points=clicks[:1], labels=[1])
    pred.add_new_points_or_box(state, 0, obj_id=2, points=clicks[1:], labels=[1])

    mine = {}
    for t, ids, masks in pred.propagate_in_video(state):
        out = state["cond_frames"].get(t) or state["non_cond_frames"][t]
        mine[t] = {
            "masks": np.array(masks),
            "obj_ptr": out["obj_ptr"][:B].copy(),
            "maskmem": out["maskmem"][:B].copy(),
        }

    # ---- reference rollout ----
    def feats_for(t):
        s0 = torch.from_numpy(raw[t][0].transpose(0, 3, 1, 2))
        s1 = torch.from_numpy(raw[t][1].transpose(0, 3, 1, 2))
        top = torch.from_numpy(raw[t][2].transpose(0, 3, 1, 2))
        with torch.no_grad():
            s0 = ref.sam_mask_decoder.conv_s0(s0)
            s1 = ref.sam_mask_decoder.conv_s1(s1)
        # (HW, B, C) seq-first, tiled to both objects
        def seq(x):
            return x.flatten(2).permute(2, 0, 1).expand(-1, B, -1).contiguous()

        return [seq(s0), seq(s1), seq(top)]

    pos_t = torch.from_numpy(pos.copy())[:, None, :].expand(-1, B, -1).contiguous()
    feat_sizes = [(4 * FS, 4 * FS), (2 * FS, 2 * FS), (FS, FS)]
    output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    want = {}
    # the reference hard-calls .cuda() on stored memories
    # (sam3_tracker_base.py:659); make it the identity on this CPU box
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    with torch.no_grad():
        for t in range(NUM_FRAMES):
            point_inputs = None
            if t == 0:
                point_inputs = {
                    "point_coords": torch.from_numpy(clicks)[:, None, :],
                    "point_labels": torch.ones(B, 1, dtype=torch.int32),
                }
            out = ref.track_step(
                frame_idx=t,
                is_init_cond_frame=(t == 0),
                current_vision_feats=feats_for(t),
                current_vision_pos_embeds=[pos_t],
                feat_sizes=feat_sizes,
                image=None,
                point_inputs=point_inputs,
                mask_inputs=None,
                output_dict=output_dict,
                num_frames=NUM_FRAMES,
            )
            key = "cond_frame_outputs" if t == 0 else "non_cond_frame_outputs"
            output_dict[key][t] = out
            want[t] = {
                "masks": out["pred_masks"].numpy(),
                "obj_ptr": out["obj_ptr"].numpy(),
                "maskmem": out["maskmem_features"].numpy(),
            }
    torch.Tensor.cuda = orig_cuda

    for t in range(NUM_FRAMES):
        np.testing.assert_allclose(
            mine[t]["masks"], want[t]["masks"], atol=2e-3, rtol=1e-3,
            err_msg=f"masks frame {t}",
        )
        np.testing.assert_allclose(
            mine[t]["obj_ptr"], want[t]["obj_ptr"], atol=2e-3, rtol=1e-3,
            err_msg=f"obj_ptr frame {t}",
        )
        np.testing.assert_allclose(
            mine[t]["maskmem"].transpose(0, 3, 1, 2), want[t]["maskmem"],
            atol=2e-3, rtol=1e-3, err_msg=f"maskmem frame {t}",
        )
