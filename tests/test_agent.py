"""Agent loop with a fake LLM and a fake processor (no model, no network)."""

import json

import numpy as np

from efficientsam3_tpu.agent import SegmentationAgent


class FakeProcessor:
    """Only 'a yellow dog' produces detections."""

    def set_image(self, image):
        return {}

    def reset_all_prompts(self, state):
        state.clear()

    def set_text_prompt(self, phrase, state):
        if phrase == "a yellow dog":
            state["scores"] = np.asarray([0.9, 0.7])
            state["masks"] = np.ones((2, 8, 8), bool)
            state["boxes"] = np.zeros((2, 4))
        else:
            state["scores"] = np.zeros(0)
            state["masks"] = np.zeros((0, 8, 8), bool)
            state["boxes"] = np.zeros((0, 4))
        return state


def fake_llm(messages):
    last = messages[-1]["content"]
    if "Goal" in last:
        return json.dumps({"phrase": "dog"})
    if "0 detections" in last:
        return json.dumps({"phrase": "a yellow dog"})
    return json.dumps({"done": True, "best_phrase": "a yellow dog"})


def test_agent_refines_until_detection():
    agent = SegmentationAgent(FakeProcessor(), fake_llm, max_iterations=5)
    result = agent.run(np.zeros((16, 16, 3), np.uint8), "find the yellow dog")
    assert result is not None
    assert result.phrase == "a yellow dog"
    assert len(result.scores) == 2
    assert result.iterations <= 3


def test_agent_history_pruning():
    calls = []

    def llm(messages):
        calls.append(len(messages))
        return json.dumps({"phrase": f"thing {len(calls)}"})

    agent = SegmentationAgent(FakeProcessor(), llm, max_iterations=10, history_window=4)
    agent.run(np.zeros((8, 8, 3), np.uint8), "goal")
    assert max(calls) <= 4
