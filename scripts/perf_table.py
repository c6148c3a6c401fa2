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
    ("SAM1 point prompt ms/frame", lambda p, e: e.get("sam1_point_prompt_ms_frame")),
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    table = render(load_rounds())
    block = f"{BEGIN}\n\n{table}\n\n{END}"
    if not args.write:
        print(block)
        return
    doc = os.path.join(ROOT, "docs", "performance.md")
    with open(doc) as f:
        text = f.read()
    if BEGIN in text:
        text = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, text, flags=re.S
        )
    else:
        title = "## Measured numbers by round\n\n"
        text = text.rstrip() + "\n\n" + title + block + "\n"
    with open(doc, "w") as f:
        f.write(text)
    print(f"updated {doc}")


if __name__ == "__main__":
    main()
