"""Agent: MLLM-orchestrated promptable segmentation.

Mirrors the reference agent (sam3/sam3/agent/agent_core.py, client_llm.py,
client_sam3.py): an LLM iteratively proposes noun-phrase prompts for a
target description, inspects the segmentation results, and refines the
phrase until the detections satisfy it (or the iteration budget runs out).
Message history is pruned to a fixed window (agent_core.py:58).

The LLM is dependency-injected: any callable(messages) -> str works — an
OpenAI-compatible client (`openai_chat_client`) or a local stub in tests.
The segmentation backend is any Sam3Processor-compatible object.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Optional

import numpy as np

SYSTEM_PROMPT = (
    "You control a promptable segmentation model. Given a user goal, reply "
    "with a JSON object {\"phrase\": <short noun phrase to segment>} or "
    "{\"done\": true, \"best_phrase\": <phrase>} when the results look right. "
    "You will be shown the number of detections and their scores after each try."
)


def openai_chat_client(base_url: str, api_key: str, model: str) -> Callable:
    """OpenAI-compatible chat client (reference client_llm.py:34)."""

    def call(messages):
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            f"{base_url.rstrip('/')}/chat/completions",
            data=_json.dumps({"model": model, "messages": messages}).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {api_key}",
            },
        )
        with urllib.request.urlopen(req) as r:
            out = _json.loads(r.read())
        return out["choices"][0]["message"]["content"]

    return call


@dataclasses.dataclass
class AgentResult:
    phrase: str
    scores: np.ndarray
    masks: np.ndarray
    boxes: np.ndarray
    iterations: int


class SegmentationAgent:
    def __init__(
        self,
        processor,  # Sam3Processor
        llm: Callable,  # callable(messages) -> str
        max_iterations: int = 5,
        history_window: int = 12,
    ):
        self.processor = processor
        self.llm = llm
        self.max_iterations = max_iterations
        self.history_window = history_window

    def _prune(self, messages: list) -> list:
        """Keep the system prompt + the most recent window (agent_core.py:58)."""
        if len(messages) <= self.history_window:
            return messages
        return [messages[0]] + messages[-(self.history_window - 1) :]

    def run(self, image: np.ndarray, goal: str) -> Optional[AgentResult]:
        state = self.processor.set_image(image)
        messages = [
            {"role": "system", "content": SYSTEM_PROMPT},
            {"role": "user", "content": f"Goal: {goal}"},
        ]
        best = None
        for it in range(self.max_iterations):
            reply = self.llm(self._prune(messages))
            messages.append({"role": "assistant", "content": reply})
            try:
                cmd = json.loads(reply)
            except json.JSONDecodeError:
                cmd = {"phrase": reply.strip()}
            if cmd.get("done"):
                break
            phrase = cmd.get("phrase", goal)
            self.processor.reset_all_prompts(state)
            state = self.processor.set_text_prompt(phrase, state)
            scores = np.asarray(state["scores"])
            result = AgentResult(
                phrase=phrase,
                scores=scores,
                masks=np.asarray(state["masks"]),
                boxes=np.asarray(state["boxes"]),
                iterations=it + 1,
            )
            if best is None or (
                len(scores) and scores.max() > (best.scores.max() if len(best.scores) else 0)
            ):
                best = result
            messages.append(
                {
                    "role": "user",
                    "content": (
                        f"phrase '{phrase}': {len(scores)} detections, "
                        f"scores {np.round(scores[:5], 3).tolist()}"
                    ),
                }
            )
        return best
