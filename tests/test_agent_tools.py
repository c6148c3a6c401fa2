"""Agent tool loop + SoM/zoom-in helpers (no model, no network).

Covers the reference agent surface (sam3/sam3/agent/agent_core.py,
helpers/som_utils.py, helpers/zoom_in.py, viz.py): SoM rendering,
farthest-color pick, zoom-in geometry, and the 4-tool session protocol
with per-mask Accept/Reject checking and history pruning.
"""

import json

import numpy as np
import pytest

from efficientsam3_tpu.agent import (
    ColorPalette,
    ToolCallError,
    agent_inference,
    compute_zoom_boxes,
    overlay_instances,
    parse_tool_call,
    render_zoom_in,
    visualize,
)
from efficientsam3_tpu.agent.som import draw_number


def _scene():
    img = np.full((96, 128, 3), 40, np.uint8)
    m1 = np.zeros((96, 128), bool)
    m1[10:30, 10:40] = True
    m2 = np.zeros((96, 128), bool)
    m2[50:90, 60:120] = True
    return img, [m1, m2], [[10, 10, 40, 30], [60, 50, 120, 90]]


def test_som_overlay_marks_and_colors():
    img, masks, boxes = _scene()
    out = overlay_instances(img, masks, boxes)
    assert out.shape == img.shape and out.dtype == np.uint8
    # each mask region recolored toward a distinct palette color
    c1 = out[20, 25].astype(int)
    c2 = out[70, 90].astype(int)
    assert not np.array_equal(c1, [40, 40, 40])
    assert not np.array_equal(c2, [40, 40, 40])
    assert not np.array_equal(c1, c2)
    # number chip drawn near each box corner (solid fill differs from bg)
    assert (out[12:20, 12:20] != 40).any()


def test_draw_number_stays_in_bounds():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_number(img, 12, (30, 30), (255, 255, 0), scale=2)
    assert out.shape == img.shape  # clamped, no crash
    assert (out != 0).any()


def test_farthest_color_avoids_region_color():
    # a pure-red region: red must not be chosen as the mark color
    region = np.zeros((20, 20, 3), np.uint8)
    region[..., 0] = 255
    color, dist = ColorPalette.default().find_farthest_color(region)
    assert color != (255, 0, 0)
    assert dist > 100


def test_zoom_boxes_contain_mask_and_stay_inside():
    h, w = 200, 300
    box = [120, 80, 40, 30]  # xywh
    zoom, ctx = compute_zoom_boxes(box, h, w, mask_area=40 * 30 * 0.8)
    for zb in (zoom, ctx):
        assert zb[0] >= -1e-6 and zb[1] >= -1e-6
        assert zb[0] + zb[2] <= w + 1e-6
        assert zb[1] + zb[3] <= h + 1e-6
        # window contains the original box
        assert zb[0] <= box[0] + 1e-6 and zb[1] <= box[1] + 1e-6
        assert zb[0] + zb[2] >= box[0] + box[2] - 1e-6
    # zoom window is tighter than context for a large mask
    assert zoom[2] * zoom[3] <= ctx[2] * ctx[3] + 1e-6


def test_render_zoom_in_two_panels():
    img, masks, boxes = _scene()
    out, color_hex = render_zoom_in(img, masks[0], boxes[0])
    assert out.ndim == 3 and out.dtype == np.uint8
    assert color_hex.startswith("#") and len(color_hex) == 7
    # composed image extends beyond one panel (two panels + gap)
    assert max(out.shape[:2]) > 448


def test_visualize_modes():
    img, masks, boxes = _scene()
    res = {"image": img, "masks": masks, "boxes": boxes, "scores": [0.9, 0.8]}
    full = visualize(res)
    assert full.shape == img.shape
    single, zoomed = visualize(res, zoom_in_index=1)
    assert single.shape == img.shape
    assert zoomed.ndim == 3
    with pytest.raises(ValueError):
        visualize(res, zoom_in_index=5)


def test_parse_tool_call():
    call = parse_tool_call(
        'thinking...\n<tool>{"name": "segment_phrase", '
        '"parameters": {"text_prompt": "dog"}}</tool> trailing'
    )
    assert call["name"] == "segment_phrase"
    assert call["parameters"]["text_prompt"] == "dog"
    with pytest.raises(ToolCallError):
        parse_tool_call("no tool here")


class ScriptedLLM:
    """Drives: segment 'animal' (empty) -> segment 'dog' (2 masks) ->
    examine (accept #1, reject #2) -> select [1]."""

    def __init__(self):
        self.n_checks = 0
        self.seen_warning = False

    def __call__(self, messages):
        sys = messages[0]["content"]
        if "verification" in sys:  # checking subcall
            self.n_checks += 1
            return (
                "<verdict>Accept</verdict>"
                if self.n_checks == 1
                else "<verdict>Reject</verdict>"
            )
        # main loop: inspect the last user text
        last_texts = [
            c["text"]
            for m in messages
            if isinstance(m.get("content"), list)
            for c in m["content"]
            if isinstance(c, dict) and c.get("type") == "text"
        ]
        state = last_texts[-1] if last_texts else ""
        if any("Never reuse any of" in t for t in last_texts):
            self.seen_warning = True
        if "user query is" in state:
            return '<tool>{"name": "segment_phrase", "parameters": {"text_prompt": "animal"}}</tool>'
        if "produced no masks" in state:
            return '<tool>{"name": "segment_phrase", "parameters": {"text_prompt": "dog"}}</tool>'
        if "segment_phrase produced" in state:
            return '<tool>{"name": "examine_each_mask", "parameters": {}}</tool>'
        if "remain" in state:
            return '<tool>{"name": "select_masks_and_return", "parameters": {"final_answer_masks": [1, 7]}}</tool>'
        raise AssertionError(f"unexpected state: {state[:100]}")


def _segment_factory():
    img, masks, boxes = _scene()

    def segment(phrase):
        if phrase == "dog":
            return {
                "scores": np.asarray([0.9, 0.4]),
                "masks": np.stack(masks),
                "boxes": np.asarray(boxes, np.float32),
            }
        return {
            "scores": np.zeros(0),
            "masks": np.zeros((0, 96, 128), bool),
            "boxes": np.zeros((0, 4)),
        }

    return img, segment


def test_agent_inference_full_session():
    img, segment = _segment_factory()
    llm = ScriptedLLM()
    events = []
    messages, final, rendered = agent_inference(
        img, "the sleeping dog", llm, segment=segment,
        on_event=events.append,
    )
    # examine kept only mask #1; select asked for [1, 7] -> 7 dropped
    assert len(final["masks"]) == 1
    assert final["scores"] == [0.9]
    assert rendered.shape == img.shape
    assert llm.n_checks == 2
    # the empty 'animal' attempt burned a prompt -> warning was injected
    assert llm.seen_warning
    kinds = [e["kind"] for e in events]
    assert "tool_call" in kinds and "verdict" in kinds
    # pruning invariant: never more than 2 images in history
    n_img = sum(
        1
        for m in messages
        if isinstance(m.get("content"), list)
        for c in m["content"]
        if isinstance(c, dict) and c.get("type") == "image"
    )
    assert n_img <= 2


def test_agent_inference_report_no_mask():
    img, segment = _segment_factory()

    def llm(messages):
        return '<tool>{"name": "report_no_mask", "parameters": {}}</tool>'

    _, final, rendered = agent_inference(img, "a unicorn", llm, segment=segment)
    assert final["masks"] == []
    assert np.array_equal(rendered, img)


def test_agent_inference_rejects_bad_first_tool():
    img, segment = _segment_factory()

    def llm(messages):
        return '<tool>{"name": "examine_each_mask", "parameters": {}}</tool>'

    with pytest.raises(ToolCallError):
        agent_inference(img, "x", llm, segment=segment)
