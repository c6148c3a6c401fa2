"""Segmentation-agent example: an LLM iteratively refines the text prompt.

Equivalent of the reference's sam3_agent notebook: the MLLM proposes a
noun phrase, EfficientSAM3 grounds it, the detection summary is fed back,
and the loop repeats until the model is satisfied (reference
sam3/agent/agent_core.py loop).

Run:  python examples/agent_example.py [image.jpg] "<goal>"
Without OPENAI_BASE_URL set this uses a scripted fake LLM so the loop is
demonstrable offline.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.agent import (
    SegmentationAgent,
    agent_inference,
    openai_chat_client,
)
from efficientsam3_tpu.build import build_efficientsam3_image_model
from efficientsam3_tpu.models.geometry import Prompt
from efficientsam3_tpu.processor import Sam3Processor


def scripted_llm():
    """Offline stand-in: refines 'animal' -> 'dog' -> done."""
    replies = iter(
        [
            json.dumps({"phrase": "animal"}),
            json.dumps({"phrase": "dog"}),
            json.dumps({"done": True}),
        ]
    )

    def call(messages):
        return next(replies)

    return call


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else None
    goal = sys.argv[2] if len(sys.argv) > 2 else "segment the dog"
    if image_path:
        from PIL import Image

        image = np.asarray(Image.open(image_path).convert("RGB"))
    else:
        image = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3), np.uint8
        ).astype(np.uint8)

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="m",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
    )
    res = 1008
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3), jnp.float32),
        jnp.zeros((1, 32), jnp.int32), Prompt.empty(1, 8, 8),
    )
    processor = Sam3Processor(model, variables, resolution=res,
                              confidence_threshold=0.3)

    if os.environ.get("OPENAI_BASE_URL"):
        llm = openai_chat_client(
            os.environ["OPENAI_BASE_URL"],
            os.environ.get("OPENAI_API_KEY", ""),
            os.environ.get("OPENAI_MODEL", "gpt-4o"),
        )
    else:
        llm = scripted_llm()

    agent = SegmentationAgent(processor, llm, max_iterations=4)
    result = agent.run(image, goal)
    if result is None:
        print("agent found nothing")
    else:
        print(f"best phrase: {result.phrase!r} after {result.iterations} "
              f"iterations, {len(result.scores)} detections")

    # Full tool-call session (reference agent_core.agent_inference): the
    # MLLM drives segment_phrase / examine_each_mask /
    # select_masks_and_return over SoM-numbered renders. Offline, a
    # scripted driver segments once, zoom-examines each mask (accepting
    # all), and returns everything.
    state = {"n": 0}

    def tool_llm(messages):
        if "verification" in messages[0]["content"]:
            return "<verdict>Accept</verdict>"
        state["n"] += 1
        if state["n"] == 1:
            return ('<tool>{"name": "segment_phrase", "parameters": '
                    '{"text_prompt": "dog"}}</tool>')
        texts = [c.get("text", "") for m in messages
                 for c in (m["content"] if isinstance(m["content"], list) else [])
                 if isinstance(c, dict)]
        if any("produced no masks" in t for t in texts):
            return '<tool>{"name": "report_no_mask", "parameters": {}}</tool>'
        if any("segment_phrase produced" in t for t in texts):
            return '<tool>{"name": "examine_each_mask", "parameters": {}}</tool>'
        return ('<tool>{"name": "select_masks_and_return", "parameters": '
                '{"final_answer_masks": [1, 2, 3]}}</tool>')

    messages, final, rendered = agent_inference(
        image, goal, tool_llm if not os.environ.get("OPENAI_BASE_URL") else llm,
        processor=processor,
    )
    print(f"tool session: {len(final['masks'])} final masks")
    try:
        from PIL import Image as PILImage

        PILImage.fromarray(rendered).save("/tmp/agent_som.png")
        print("SoM render saved to /tmp/agent_som.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
