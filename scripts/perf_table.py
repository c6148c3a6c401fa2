#!/usr/bin/env python
"""Render the per-round performance table from BENCH_r*.json (VERDICT r2 #6).

The bench numbers of record live in BENCH_r*.json (written by the driver
running bench.py each round); this script turns them into the markdown table
embedded in docs/performance.md between the AUTOGEN markers, so the doc can
never silently diverge from the measured JSON.

Usage: python scripts/perf_table.py [--write]
  default prints the table; --write splices it into docs/performance.md.
"""

import argparse
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- AUTOGEN:BENCH_TABLE begin (scripts/perf_table.py) -->"
END = "<!-- AUTOGEN:BENCH_TABLE end -->"
RM_BEGIN = "<!-- AUTOGEN:README_STATUS begin (scripts/perf_table.py) -->"
RM_END = "<!-- AUTOGEN:README_STATUS end -->"

ROWS = [
    ("grounding ms/frame (1008², b1, text prompt)", lambda p, e: p.get("value")),
    ("vs 10 ms north star", lambda p, e: p.get("vs_baseline")),
    ("grounding MFU %", lambda p, e: e.get("grounding_mfu_pct")),
    ("stage: trunk ms", lambda p, e: (e.get("stage_ms") or {}).get("trunk")),
    ("stage: neck ms", lambda p, e: (e.get("stage_ms") or {}).get("neck")),
    ("stage: text+geo+fusion ms", lambda p, e: (e.get("stage_ms") or {}).get("text_geo_fusion")),
    ("stage: decoder+scoring ms", lambda p, e: (e.get("stage_ms") or {}).get("decoder_scoring")),
    ("stage: seg head ms", lambda p, e: (e.get("stage_ms") or {}).get("seg_head")),
    ("batch-8 throughput img/s", lambda p, e: e.get("batch8_throughput_img_s")),
    ("tracker step ms/frame (8 slots)", lambda p, e: e.get("tracker_step_ms_frame")),
    ("tracker step, cached K/V ms/frame", lambda p, e: e.get("tracker_step_cached_ms_frame")),
    ("tracker step, cached + int8 bank ms/frame", lambda p, e: e.get("tracker_step_cached_q8_ms_frame")),
    ("text encode (once per prompt) ms", lambda p, e: e.get("text_encode_ms_once")),
    ("SAM1 point prompt ms/frame", lambda p, e: e.get("sam1_point_prompt_ms_frame")),
    ("video-PCS frame ms (det+track, 8 obj)", lambda p, e: e.get("video_pcs_ms_frame")),
    ("video-PCS FPS", lambda p, e: e.get("video_pcs_fps")),
    ("end-to-end ms/frame (uint8 in, masks out)", lambda p, e: e.get("e2e_ms_frame")),
    ("tunnel RTT ms (not in step times)", lambda p, e: e.get("rtt_ms")),
]


def load_rounds():
    rounds = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        parsed = data.get("parsed") or {}
        if not parsed and "metric" in data:
            parsed = data
        rounds.append((int(m.group(1)), parsed))
    return rounds


def fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def render(rounds):
    header = "| metric | " + " | ".join(f"r{n}" for n, _ in rounds) + " |"
    sep = "|---" * (len(rounds) + 1) + "|"
    lines = [header, sep]
    for label, get in ROWS:
        vals = [get(p, p.get("extras") or {}) for _, p in rounds]
        if all(v is None for v in vals):
            continue
        lines.append(f"| {label} | " + " | ".join(fmt(v) for v in vals) + " |")
    lines.append("")
    lines.append(
        "r1's number predates the forced-execution methodology (the tunnel's "
        "`block_until_ready` returns before the chip runs; r1 measured "
        "dispatch, not compute) — r2 onward are true device step times. "
        "MFU figures before r3 used v5e's int8 peak (394 TF/s) and read "
        "half the true bf16 utilization."
    )
    return "\n".join(lines)


def render_readme(rounds):
    """Compact latest-round status lines for README.md (between the
    AUTOGEN:README_STATUS markers). Prose stays qualitative; every number
    in the README comes from the latest BENCH_r*.json through here."""
    if not rounds:
        return "(no BENCH_r*.json yet)"
    n, p = rounds[-1]
    e = p.get("extras") or {}
    sm = e.get("stage_ms") or {}
    lines = [f"Latest bench of record: `BENCH_r{n:02d}.json` (one v5e chip, bf16)."]
    lines.append("")

    def add(label, val, unit=""):
        if val is not None:
            lines.append(f"- {label}: **{val}{unit}**")

    add("EV-M text grounding (1008², batch 1)", p.get("value"), " ms/frame")
    add("vs the 10 ms north star", p.get("vs_baseline"), "×")
    add("grounding MFU", e.get("grounding_mfu_pct"), "%")
    if sm:
        order = [
            ("trunk", "trunk"), ("neck", "neck"),
            ("text_geo_fusion", "text+geo+fusion"),
            ("decoder_scoring", "decoder"), ("seg_head", "seg head"),
        ]
        parts = " | ".join(
            f"{lbl} {sm[k]}" for k, lbl in order if k in sm
        )
        lines.append(f"- stage breakdown (ms): {parts}")
    add("batch-8 grounding throughput", e.get("batch8_throughput_img_s"),
        " img/s")
    add("SAM1-task point prompt (the stated north star)",
        e.get("sam1_point_prompt_ms_frame"), " ms/frame")
    add("tracker step, 8 slots (plain / cached K/V)",
        (f'{e.get("tracker_step_ms_frame")} / '
         f'{e.get("tracker_step_cached_ms_frame")}')
        if e.get("tracker_step_ms_frame") is not None else None, " ms/frame")
    add("full video-PCS frame (detect+track+associate, 8 objects)",
        e.get("video_pcs_ms_frame"), " ms/frame")
    if e.get("video_pcs_fps") is not None:
        lines[-1] += f" ({e['video_pcs_fps']} FPS)"
    add("end-to-end (uint8 in, masks out)", e.get("e2e_ms_frame"), " ms/frame")
    lines.append("")
    lines.append(
        "Full per-round table: `docs/performance.md`. Regenerate both "
        "blocks with `python scripts/perf_table.py --write` after a bench "
        "round lands (tests/test_docs_current.py fails loudly if they rot)."
    )
    return "\n".join(lines)


def splice(text, begin, end, block):
    if begin in text:
        return re.sub(
            re.escape(begin) + r".*?" + re.escape(end), block, text, flags=re.S
        )
    return text.rstrip() + "\n\n" + block + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    rounds = load_rounds()
    table = render(rounds)
    block = f"{BEGIN}\n\n{table}\n\n{END}"
    rm_block = f"{RM_BEGIN}\n{render_readme(rounds)}\n{RM_END}"
    if not args.write:
        print(block)
        print()
        print(rm_block)
        return
    doc = os.path.join(ROOT, "docs", "performance.md")
    with open(doc) as f:
        text = f.read()
    with open(doc, "w") as f:
        f.write(splice(text, BEGIN, END, block))
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    with open(readme, "w") as f:
        f.write(splice(text, RM_BEGIN, RM_END, rm_block))
    print(f"updated {doc} and {readme}")


if __name__ == "__main__":
    main()
