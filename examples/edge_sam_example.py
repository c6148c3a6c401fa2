"""EdgeSAM-style standalone SAM1 student example.

Equivalent of the reference's student_sam predictor usage
(sam3/sam3/model/student_sam/predictor.py + build_sam.py registry): a
distilled student trunk (RepViT / TinyViT / EfficientViT) with the original
SAM prompt encoder + mask decoder — no SAM3 detector, no tracker — for
classic point/box interactive segmentation.

Run:  python examples/edge_sam_example.py [image.jpg] [registry_key]
Uses random init when no checkpoint is wired in (API demonstration).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from efficientsam3_tpu.student_sam import (
        SamStudentPredictor,
        sam_model_registry,
    )

    image_path = sys.argv[1] if len(sys.argv) > 1 else None
    key = sys.argv[2] if len(sys.argv) > 2 else "efficientvit"
    if image_path:
        from PIL import Image

        image = np.asarray(Image.open(image_path).convert("RGB"))
    else:
        image = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3), np.uint8
        ).astype(np.uint8)

    model = sam_model_registry[key]()
    h, w = model.image_size, model.image_size
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, 2, 2)), -jnp.ones((1, 2), jnp.int32), True,
    )

    pred = SamStudentPredictor(model, variables)
    pred.set_image(image)

    # single positive click
    masks, ious, low = pred.predict(
        point_coords=np.array([[320.0, 240.0]]), point_labels=[1]
    )
    print(f"[{key}] point prompt: masks {masks.shape}, predicted IoUs {ious}")

    # box prompt, single-mask output
    m2, i2, _ = pred.predict(
        box=np.array([120.0, 80.0, 520.0, 400.0]), multimask_output=False
    )
    print(f"[{key}] box prompt: mask {m2.shape}, area {int(m2.sum())}")


if __name__ == "__main__":
    main()
