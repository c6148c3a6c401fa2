"""End-to-end model -> postprocess -> evaluator tests.

Closes the loop the reference closes with its gold harness: the full
pipeline (processor -> COCO-format records -> cgF1/mAP evaluators) runs on
a synthetic fixture, and an oracle predictor validates that perfect
predictions score ~1.0 (so format mismatches can't hide)."""

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.eval.fixtures import make_shapes_fixture, oracle_predict_fn
from efficientsam3_tpu.eval.gold import evaluate_cgf1_files, run_gold_inference


def test_oracle_predictions_score_high():
    images, gt, pairs = make_shapes_fixture(num_images=6, size=96, seed=3)
    predict = oracle_predict_fn(images, gt)
    records = run_gold_inference(
        predict, gt, load_image=lambda info: images[info["image_index"]]
    )
    out = evaluate_cgf1_files(records, [gt], iou_type="segm")
    assert out["cgF1"] > 0.95, out
    assert out["IL_MCC"] > 0.95

    # degraded predictions must score lower
    noisy = oracle_predict_fn(images, gt, drop_prob=0.5, seed=7)
    records2 = run_gold_inference(
        noisy, gt, load_image=lambda info: images[info["image_index"]]
    )
    out2 = evaluate_cgf1_files(records2, [gt], iou_type="segm")
    assert out2["cgF1"] < out["cgF1"]


def test_oracle_mask_map_high():
    from efficientsam3_tpu.eval.coco_format import ann_to_mask
    from efficientsam3_tpu.eval.coco_map import CocoMAPEvaluator

    images, gt, pairs = make_shapes_fixture(num_images=6, size=96, seed=3)
    predict = oracle_predict_fn(images, gt)
    by_pair = {}
    for a in gt["annotations"]:
        by_pair.setdefault(a["image_id"], []).append(a)
    ev = CocoMAPEvaluator("segm")
    for pair_id, i, q in pairs:
        recs = predict(images[i], q, pair_id)
        dt = [ann_to_mask(r, 96, 96) for r in recs]
        gts = [ann_to_mask(a, 96, 96) for a in by_pair.get(pair_id, [])]
        if not gts and not dt:
            continue
        ev.add_image(
            1, [r["score"] for r in recs],
            np.stack(dt) if dt else np.zeros((0, 96, 96), bool),
            np.stack(gts) if gts else np.zeros((0, 96, 96), bool),
        )
    out = ev.summarize()
    assert out["AP"] > 0.95, out


def test_model_through_evaluators():
    """The REAL model (tiny config, random weights) drives the evaluators
    end-to-end: processor -> records -> cgF1 + mAP. Random weights score
    ~0, but the formats and plumbing are exercised for real."""
    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.processor import Sam3Processor
    from efficientsam3_tpu.eval.coco_format import mask_to_rle, rle_encode_string

    images, gt, pairs = make_shapes_fixture(num_images=2, size=96, seed=3)
    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="b0", embed_size=8,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)),
        jnp.zeros((1, 16), jnp.int32), Prompt.empty(1, 8, 8),
    )
    proc = Sam3Processor(
        model, variables, resolution=112, context_length=16,
        bpe_path="/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
    )

    def predict(img, phrase, pair_id):
        state = proc.set_image(img)
        state = proc.set_text_prompt(phrase, state)
        masks = np.asarray(state["masks"])
        scores = np.asarray(state["scores"])
        boxes = np.asarray(state["boxes"])
        recs = []
        for k in range(min(len(scores), 5)):
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
    out = evaluate_cgf1_files(records, [gt], iou_type="segm")
    for key in ("cgF1", "IL_MCC", "positive_micro_F1"):
        assert np.isfinite(out[key]), out
    assert 0.0 <= out["cgF1"] <= 1.0
