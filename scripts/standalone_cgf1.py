#!/usr/bin/env python
"""Standalone cgF1 CLI: predictions file + ground-truth file(s) -> metrics.

Mirrors reference sam3/scripts/eval/standalone_cgf1.py. With several GT
files (SA-Co gold's a/b/c annotators), the multi-annotator oracle selects
the best-scoring annotation per (image, query) pair.

Usage:
  python scripts/standalone_cgf1.py --pred_file preds.json \
      --gt_files gold_a.json gold_b.json gold_c.json [--iou_type segm]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_file", required=True,
                    help="COCO-format predictions json")
    ap.add_argument("--gt_files", nargs="+", required=True,
                    help="COCO-format ground-truth json file(s)")
    ap.add_argument("--iou_type", default="segm", choices=("segm", "bbox"))
    args = ap.parse_args()

    from efficientsam3_tpu.eval.gold import evaluate_cgf1_files

    if len(args.gt_files) < 3 and any("gold" in g for g in args.gt_files):
        print("WARNING: gold subsets usually ship 3 annotator files (a/b/c)")
    out = evaluate_cgf1_files(args.pred_file, args.gt_files, args.iou_type)
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
