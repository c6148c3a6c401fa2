"""EfficientSAM3 image PCS example: text + box + point prompting.

Equivalent of the reference's efficientsam3_examples/image predictor
notebooks. Expects a released checkpoint converted with
utils/convert_model.convert_image_model (or random init for a dry run).

Run:  python examples/image_predictor_example.py [ckpt.pt] [image.jpg]
With no checkpoint argument the model is randomly initialized (dry run);
with no image a synthetic one is used.
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
    args = [a for a in sys.argv[1:] if a != "--random-init"]
    image_path = args[0] if args else None
    model = build_efficientsam3_image_model(
        backbone_type="efficientvit",
        model_name="m",  # EV-M
        text_encoder_type="MobileCLIP-S0",
        text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    if image_path and image_path.endswith(".pt"):
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import convert_image_model

        sd = load_torch_state_dict(image_path)
        params, stats = convert_image_model(
            sd, "efficientvit", "b1", text_encoder_type="MobileCLIP-S0"
        )
        variables = {"params": params, "batch_stats": stats}
        image_path = args[1] if len(args) > 1 else None
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1008, 1008, 3)),
            jnp.zeros((1, 32), jnp.int32),
            Prompt.empty(1, 8, 8),
        )

    if image_path:
        from PIL import Image

        image = np.asarray(Image.open(image_path).convert("RGB"))
    else:
        image = (np.random.rand(480, 640, 3) * 255).astype(np.uint8)

    proc = Sam3Processor(model, variables, context_length=32)
    state = proc.set_image(image)
    state = proc.set_text_prompt("a dog", state)
    print(f"text prompt: {len(state['scores'])} detections, "
          f"scores={np.round(state['scores'][:5], 3)}")

    state = proc.add_geometric_prompt([0.5, 0.5, 0.4, 0.4], True, state)
    print(f"+box prompt: {len(state['scores'])} detections")

    state = proc.add_point_prompt([image.shape[1] // 2, image.shape[0] // 2], 1, state)
    print(f"+point prompt: {len(state['scores'])} detections; "
          f"masks shape {state['masks'].shape}")


if __name__ == "__main__":
    main()
