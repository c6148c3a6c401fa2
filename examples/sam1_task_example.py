"""SAM1-task example: interactive point/box segmentation + automatic masks.

Equivalent of the reference's efficientsam3_for_sam1_task_example.py /
sam3_for_sam1_task_example notebooks: a student encoder drives the SAM
prompt-encoder/mask-decoder heads directly (single foreground object per
prompt), plus SAM's automatic mask generation over a point grid.

Run:  python examples/sam1_task_example.py [image.jpg]
Uses random init when no checkpoint is wired in (API demonstration).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.automatic_mask_generator import AutomaticMaskGenerator
from efficientsam3_tpu.build import build_efficientsam3_video_model
from efficientsam3_tpu.sam1_task import InteractiveImagePredictor


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else None
    if image_path:
        from PIL import Image

        image = np.asarray(Image.open(image_path).convert("RGB"))
    else:
        image = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3), np.uint8
        ).astype(np.uint8)

    # the tracker core owns the SAM heads; its no-memory path is the SAM1
    # task. The frame pyramid comes from the image model's SAM2 neck.
    image_model, core = build_efficientsam3_video_model(
        backbone_type="repvit", model_name="m1.1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
    )
    rng = jax.random.PRNGKey(0)
    res = core.image_size
    from efficientsam3_tpu.models.geometry import Prompt

    ivars = image_model.init(
        rng, jnp.zeros((1, res, res, 3), jnp.float32),
        jnp.zeros((1, 32), jnp.int32), Prompt.empty(1, 2, 2),
    )
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    variables = init_tracker_variables(core, rng)

    def encode_frame(img):
        return image_model.apply(ivars, img, method=image_model.encode_image)

    predictor = InteractiveImagePredictor(core, variables, encode_frame)
    predictor.set_image(image)

    h, w = image.shape[:2]
    masks, ious, logits = predictor.predict(
        point_coords=np.asarray([[w // 2, h // 2]]),
        point_labels=np.asarray([1]),
        multimask_output=True,
    )
    best = int(np.argmax(ious))
    print(f"point prompt -> {masks.shape[0]} masks, best IoU pred "
          f"{float(ious[best]):.3f}, area {int(masks[best].sum())} px")

    box = np.asarray([w * 0.25, h * 0.25, w * 0.75, h * 0.75])
    masks_b, ious_b, _ = predictor.predict(box=box, multimask_output=False)
    print(f"box prompt   -> mask area {int(masks_b[0].sum())} px")

    amg = AutomaticMaskGenerator(predictor, points_per_side=8)
    anns = amg.generate(image)
    print(f"automatic    -> {len(anns)} masks")


if __name__ == "__main__":
    main()
