"""Batched image PCS example: one concept over a batch of images.

Equivalent of the reference's batched-inference notebook usage
(sam3_image_processor.py set_image_batch): encode a whole batch in one
jitted call, set one text prompt, and read per-image detections. On TPU the
batch rides the MXU's batch dimension — throughput scales near-linearly
(bench.py's batch-8 metric).

Run:  python examples/batch_processor_example.py [image1.jpg image2.jpg ...]
With no images synthetic ones are used (random init, API demonstration).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.build import build_efficientsam3_image_model
from efficientsam3_tpu.models.geometry import Prompt
from efficientsam3_tpu.processor import Sam3Processor


def main():
    paths = sys.argv[1:]
    if paths:
        from PIL import Image

        images = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    else:
        rng = np.random.default_rng(0)
        images = [
            (rng.random((480, 640, 3)) * 255).astype(np.uint8) for _ in range(4)
        ]

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="m",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1008, 1008, 3)),
        jnp.zeros((1, 32), jnp.int32), Prompt.empty(1, 8, 8),
    )
    proc = Sam3Processor(model, variables)

    state = proc.set_image_batch(images)
    state = proc.set_text_prompt("a red ball", state)
    for i in range(len(images)):
        scores = np.asarray(state["scores"][i])
        masks = np.asarray(state["masks"][i])
        print(
            f"image {i}: {len(scores)} detections"
            + (f", best score {scores.max():.3f}" if len(scores) else "")
            + (f", mask px {int(masks.sum())}" if len(masks) else "")
        )


if __name__ == "__main__":
    main()
