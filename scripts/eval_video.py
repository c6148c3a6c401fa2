"""SA-Co/VEval-style video PCS evaluation driver.

Mirrors the reference video eval harness (saco_veval_evaluators.py +
train/configs/saco_video_evals/*.yaml): run the full video pipeline
(detector + tracker + association heuristics) over each video, convert to
track records, and score HOTA / TETA / J&F against ground truth.

Dataset JSON format:
  {"videos": [
      {"id": ..., "frames_dir": "path", "text": "noun phrase",
       "annotations": [  # per frame, pipeline-output mirror
          {"obj_ids": [1, 2], "masks_npz": "gt_000.npz"}  # bool (N, H, W)
          ...
       ]}
  ]}
`--no-heuristics` maps to the reference's *_noheur configs: hotstart off,
occlusion suppression off (eval/gold.SACO_VEVAL_SUBSETS).

Usage:
  python scripts/eval_video.py --dataset veval.json --ckpt sam3.pt \
      --out VEVAL_METRICS.json [--no-heuristics]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_gt_frames(video_root, anns):
    frames = []
    for a in anns:
        masks = np.load(os.path.join(video_root, a["masks_npz"]))["masks"]
        frames.append({"obj_ids": a["obj_ids"], "masks": masks})
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="VEVAL_METRICS.json")
    ap.add_argument("--backbone", default="efficientvit")
    ap.add_argument("--model-name", default="b1")
    ap.add_argument("--resolution", type=int, default=1008)
    ap.add_argument("--no-heuristics", action="store_true",
                    help="hotstart + occlusion suppression off (the "
                         "reference's *_noheur eval configs)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.eval.hota import HOTAEvaluator
    from efficientsam3_tpu.eval.teta import TETAEvaluator
    from efficientsam3_tpu.eval.video_eval import evaluate_video_predictions
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.processor import Sam3Processor
    from efficientsam3_tpu.video.io import load_video_frames
    from efficientsam3_tpu.video.pipeline import VideoPCSConfig, VideoPCSPredictor
    from efficientsam3_tpu.video.predictor import TrackerPredictor
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    import jax

    with open(args.dataset) as f:
        dataset = json.load(f)
    root = os.path.dirname(os.path.abspath(args.dataset))

    model, core = build_efficientsam3_video_model(
        backbone_type=args.backbone, model_name=args.model_name,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, args.resolution, args.resolution, 3)),
        jnp.zeros((1, 32), jnp.int32), Prompt.empty(1, 4, 4),
    )
    if args.ckpt:
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import convert_image_model

        variables = convert_image_model(
            load_torch_state_dict(args.ckpt), variables
        )
    tvars = init_tracker_variables(core, rng)
    proc = Sam3Processor(model, variables, resolution=args.resolution)

    def encode_frame(img):
        return model.apply(variables, img, method=model.encode_image)

    def make_detector(text_state):
        def detector(frame, _):
            st = dict(text_state)
            st["original_height"], st["original_width"] = frame.shape[:2]
            st["image_feats"] = proc._encode_image(
                proc.variables, jnp.asarray(frame, jnp.float32)[None]
            )
            st = proc._forward_grounding(st)
            return {"masks": st["masks"], "scores": st["scores"],
                    "boxes": st["boxes"]}
        return detector

    cfg_kwargs = {}
    if args.no_heuristics:
        cfg_kwargs.update(
            hotstart_delay=0,
            suppress_unmatched_only_within_hotstart=True,
        )
    cfg = VideoPCSConfig(**cfg_kwargs)

    def namespace_ids(frames, vidx):
        # track ids restart per video; HOTA/TETA accumulate global ids
        return [
            dict(f, obj_ids=[(vidx << 20) + int(i) for i in f["obj_ids"]])
            for f in frames
        ]

    hota, teta = HOTAEvaluator(), TETAEvaluator()
    per_video = {}
    for vidx, video in enumerate(dataset["videos"]):
        frames = load_video_frames(
            os.path.join(root, video["frames_dir"]), resolution=args.resolution
        )
        text_state = proc.set_image(
            np.zeros((args.resolution, args.resolution, 3), np.uint8)
        )
        text_state = proc.set_text_prompt(video["text"], text_state)
        tracker = TrackerPredictor(
            core, tvars, encode_frame, obj_slots=cfg.obj_slots
        )
        pipe = VideoPCSPredictor(make_detector(text_state), tracker, cfg)
        preds = list(pipe.run_video(frames, text_state=None))
        gts = load_gt_frames(root, video["annotations"])
        per_video[str(video["id"])] = evaluate_video_predictions(
            namespace_ids(preds, vidx), namespace_ids(gts, vidx), hota, teta
        )

    metrics = {"per_video_JF": per_video}
    metrics.update(hota.summarize())
    metrics.update(teta.summarize())
    metrics["heuristics"] = not args.no_heuristics
    with open(args.out, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps({k: v for k, v in metrics.items()
                      if not isinstance(v, dict)}, indent=2))


if __name__ == "__main__":
    main()
