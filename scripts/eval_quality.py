#!/usr/bin/env python
"""Produce quality numbers (cgF1 / mask mAP / box-prompt mIoU) end-to-end.

One command runs the FULL pipeline (processor -> postprocess -> evaluators)
on the synthetic shapes fixture and writes QUALITY_r<N>.json:
  - `harness_oracle`: metrics with a perfect/degraded oracle predictor -
    validates the metric plumbing (perfect input must score ~1.0).
  - `model`: metrics from the actual model. With --checkpoint, released
    EfficientSAM3 weights are converted and evaluated; without, a tiny
    random-init model documents the harness (scores ~0 by construction).

Mirrors the reference quality drivers: eval/eval_coco.py (box-prompt mIoU),
sam3/scripts/eval/gold/eval_efficientsam3_all_subsets.py (cgF1 table),
CocoEvaluator (mask mAP).

Usage: python scripts/eval_quality.py [--checkpoint ckpt.pt] [--out QUALITY_r2.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU: the sandbox exports JAX_PLATFORMS=axon (remote TPU tunnel).
# The env var alone is NOT enough — the axon sitecustomize registers its
# PJRT plugin regardless, and jax picks the TPU backend even with
# JAX_PLATFORMS=cpu in the environment. jax.config.update before any
# backend initialization is what actually pins the platform (same
# mechanism as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault(
    "EFFICIENTSAM3_BPE_PATH",
    "/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
)

import numpy as np


def oracle_metrics():
    from efficientsam3_tpu.eval.coco_format import ann_to_mask
    from efficientsam3_tpu.eval.coco_map import CocoMAPEvaluator
    from efficientsam3_tpu.eval.fixtures import make_shapes_fixture, oracle_predict_fn
    from efficientsam3_tpu.eval.gold import evaluate_cgf1_files, run_gold_inference

    images, gt, pairs = make_shapes_fixture(num_images=12, size=112, seed=3)
    out = {}
    for name, kwargs in (
        ("perfect", {}),
        ("degraded_drop50", {"drop_prob": 0.5, "seed": 7}),
    ):
        predict = oracle_predict_fn(images, gt, **kwargs)
        records = run_gold_inference(
            predict, gt, load_image=lambda info: images[info["image_index"]]
        )
        cg = evaluate_cgf1_files(records, [gt], iou_type="segm")
        ev = CocoMAPEvaluator("segm")
        by_pair = {}
        for a in gt["annotations"]:
            by_pair.setdefault(a["image_id"], []).append(a)
        by_pred = {}
        for r in records:
            by_pred.setdefault(r["image_id"], []).append(r)
        for pair_id, i, q in pairs:
            recs = by_pred.get(pair_id, [])
            gts = [ann_to_mask(a, 112, 112) for a in by_pair.get(pair_id, [])]
            dts = [ann_to_mask(r, 112, 112) for r in recs]
            if not gts and not dts:
                continue
            ev.add_image(
                1, [r["score"] for r in recs],
                np.stack(dts) if dts else np.zeros((0, 112, 112), bool),
                np.stack(gts) if gts else np.zeros((0, 112, 112), bool),
            )
        m = ev.summarize()
        out[name] = {
            "cgF1": cg["cgF1"], "IL_MCC": cg["IL_MCC"],
            "positive_micro_F1": cg["positive_micro_F1"],
            "mask_AP": m["AP"], "mask_AP50": m["AP50"],
        }
    return out


def model_metrics(checkpoint=None, trained=None):
    import jax
    import jax.numpy as jnp

    from efficientsam3_tpu.build import (
        build_efficientsam3_image_model,
        build_efficientsam3_video_model,
    )
    from efficientsam3_tpu.eval.coco_format import (
        CocoDataset,
        mask_to_rle,
        rle_encode_string,
    )
    from efficientsam3_tpu.eval.eval_coco import evaluate_box_prompt_miou
    from efficientsam3_tpu.eval.fixtures import make_shapes_fixture
    from efficientsam3_tpu.eval.gold import evaluate_cgf1_files, run_gold_inference
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.processor import Sam3Processor
    from efficientsam3_tpu.sam1_task import InteractiveImagePredictor
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    if checkpoint:
        res, embed, ctx, name = 1008, 72, 32, "m"
    elif trained and os.path.exists(os.path.join(trained, "config.json")):
        # the resolved config train_overfit_quality.py recorded (supports
        # the scaled 504²/b1/embed-36 runs)
        import json as _json

        with open(os.path.join(trained, "config.json")) as f:
            c = _json.load(f)
        res, embed, ctx, name = c["res"], c["embed"], c["ctx"], c["name"]
    else:
        # the exact config scripts/train_overfit_quality.py trains
        from train_overfit_quality import MODEL_CFG

        res, embed, ctx, name = (
            MODEL_CFG["res"], MODEL_CFG["embed"], MODEL_CFG["ctx"],
            MODEL_CFG["name"],
        )

    model, tracker = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name=name,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=ctx,
        embed_size=embed,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1, ctx), jnp.int32),
        Prompt.empty(1, 8, 8),
    )
    tvars = init_tracker_variables(tracker, rng)
    weights = "random_init"
    if checkpoint:
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import (
            convert_image_model,
            convert_tracker_core,
        )

        sd = load_torch_state_dict(checkpoint)
        params, stats = convert_image_model(
            sd, backbone_type="efficientvit", model_name=name,
            text_encoder_type="MobileCLIP-S0", add_sam2_neck=True,
        )
        variables = {"params": params, "batch_stats": stats}
        tvars = {"params": convert_tracker_core(sd)[0]}
        weights = os.path.basename(checkpoint)
    elif trained:
        from efficientsam3_tpu.utils.checkpoint import load_checkpoint

        variables, det_step = load_checkpoint(
            os.path.join(trained, "detector"), target=variables
        )
        tvars, _ = load_checkpoint(
            os.path.join(trained, "tracker"), target=tvars
        )
        weights = f"trained ({trained} @ step {det_step})"

    proc = Sam3Processor(model, variables, resolution=res, context_length=ctx)
    from train_overfit_quality import FIXTURE
    images, gt, pairs = make_shapes_fixture(**FIXTURE)
    fsz = images.shape[1]

    def predict(img, phrase, pair_id):
        state = proc.set_image(img)
        state = proc.set_text_prompt(phrase, state)
        masks = np.asarray(state["masks"])
        scores = np.asarray(state["scores"])
        boxes = np.asarray(state["boxes"])
        recs = []
        for k in range(min(len(scores), 10)):
            m = masks[k, 0] if masks.ndim == 4 else masks[k]
            rle = mask_to_rle(np.asarray(m, bool))
            rle["counts"] = rle_encode_string(rle["counts"])
            x0, y0, x1, y1 = boxes[k]
            recs.append(
                dict(image_id=pair_id, category_id=1, score=float(scores[k]),
                     bbox=[float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                     segmentation=rle)
            )
        return recs

    records = run_gold_inference(
        predict, gt, load_image=lambda info: images[info["image_index"]]
    )
    cg = evaluate_cgf1_files(records, [gt], iou_type="segm")

    # mask mAP over the same records (the VERDICT r2 #1 bar names AP50)
    from efficientsam3_tpu.eval.coco_format import ann_to_mask
    from efficientsam3_tpu.eval.coco_map import CocoMAPEvaluator

    ev = CocoMAPEvaluator("segm")
    by_pair_gt = {}
    for a in gt["annotations"]:
        by_pair_gt.setdefault(a["image_id"], []).append(a)
    by_pair_dt = {}
    for r in records:
        by_pair_dt.setdefault(r["image_id"], []).append(r)
    for pair_id, i, q in pairs:
        recs = by_pair_dt.get(pair_id, [])
        gts = [ann_to_mask(a, fsz, fsz) for a in by_pair_gt.get(pair_id, [])]
        dts = [ann_to_mask(r, fsz, fsz) for r in recs]
        if not gts and not dts:
            continue
        ev.add_image(
            1, [r["score"] for r in recs],
            np.stack(dts) if dts else np.zeros((0, fsz, fsz), bool),
            np.stack(gts) if gts else np.zeros((0, fsz, fsz), bool),
        )
    m = ev.summarize()

    # box-prompt mIoU through the SAM1-task path (eval/eval_coco.py analog)
    encode = lambda im: model.apply(variables, im, method=model.encode_image)
    predictor = InteractiveImagePredictor(tracker, tvars, encode)
    ds = CocoDataset(gt)
    miou = evaluate_box_prompt_miou(
        predictor, ds,
        load_image=lambda info: images[info["image_index"]],
        max_images=4, max_anns_per_image=2,
    )
    return {
        "weights": weights,
        "config": {"res": res, "embed": embed, "ctx": ctx, "name": name},
        "cgF1": cg["cgF1"], "IL_MCC": cg["IL_MCC"],
        "positive_micro_F1": cg["positive_micro_F1"],
        "mask_AP": m["AP"], "mask_AP50": m["AP50"],
        "box_prompt_miou": miou["miou"],
        "num_pairs": len(pairs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--trained", default=None,
                    help="dir written by scripts/train_overfit_quality.py")
    ap.add_argument("--out", default="QUALITY_r2.json")
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()

    result = {"fixture": "synthetic shapes (eval/fixtures.py)",
              "harness_oracle": oracle_metrics()}
    if not args.skip_model:
        result["model"] = model_metrics(args.checkpoint, args.trained)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
