"""COCO box-prompt mIoU evaluation entry point.

CLI equivalent of the reference repo-root eval/eval_coco.py: load an
EfficientSAM3 checkpoint, run the SAM1-task predictor over COCO instance
boxes, report mask mIoU.

  python scripts/eval_coco.py --ann instances_val2017.json \
      --images-dir val2017 --checkpoint efficientsam3_ev_m.pt \
      --backbone efficientvit --model b1 --max-images 100
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True)
    ap.add_argument("--images-dir", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--backbone", default="efficientvit")
    ap.add_argument("--model", default="b1")
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.eval.coco_format import CocoDataset
    from efficientsam3_tpu.eval.eval_coco import evaluate_box_prompt_miou
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.sam1_task import InteractiveImagePredictor
    from efficientsam3_tpu.system import EfficientSam3System

    image_model, tracker_core = build_efficientsam3_video_model(
        backbone_type=args.backbone, model_name=args.model, dtype=jnp.bfloat16
    )
    rng = jax.random.PRNGKey(0)
    res = image_model.trunk.embed_size * 14
    img_vars = image_model.init(
        rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1, 77), jnp.int32),
        Prompt.empty(1, 8, 8),
    )
    if args.checkpoint:
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import (
            convert_image_model,
            convert_tracker_core,
        )

        sd = load_torch_state_dict(args.checkpoint)
        params, stats = convert_image_model(
            sd, args.backbone, args.model, add_sam2_neck=True
        )
        img_vars = {"params": params, "batch_stats": stats}
        t_params, _ = convert_tracker_core(sd)
        tracker_vars = {"params": t_params}
    else:
        print("WARNING: random init (no checkpoint) — numbers are meaningless")
        tracker_vars = None  # requires checkpoint for real eval

    system = EfficientSam3System(image_model, img_vars, tracker_core, tracker_vars)
    predictor = system.interactive_predictor()
    dataset = CocoDataset(args.ann)

    def load_image(info):
        from PIL import Image

        return np.asarray(
            Image.open(os.path.join(args.images_dir, info["file_name"])).convert("RGB")
        )

    out = evaluate_box_prompt_miou(
        predictor, dataset, load_image, max_images=args.max_images
    )
    print(out)


if __name__ == "__main__":
    main()
