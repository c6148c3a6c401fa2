#!/usr/bin/env python
"""Generate tests/fixtures/pycoco_oracle.json ANALYTICALLY (VERDICT r3 #7).

pycocotools cannot be installed in this image, so the oracle metrics are
derived BY HAND below, following the exact pycocotools algorithm
(cocoeval.py evaluateImg/accumulate/summarize; the reference wraps it at
sam3/sam3/eval/coco_eval.py:42). scripts/make_pycoco_fixture.py remains the
recording path for when a pycocotools environment exists.

Scenario (one category, 100x100 canvas, all masks axis-aligned rectangles
so every IoU is an exact small rational, chosen strictly BETWEEN the
0.5:0.05:0.95 thresholds so float boundary effects cannot flip a match):

  image 1:
    GT1 rows 0-9   cols 0-9    area 100  (small)
    GT2 rows 20-39 cols 20-39  area 400  (small)
    GT3 rows 60-99 cols 60-99  area 1600 (medium), iscrowd=1
    DT1 score .95 rows 0-9   cols 1-10  -> IoU(GT1) = 90/110 = 9/11 ~ .8182
    DT2 score .85 rows 20-39 cols 24-43 -> IoU(GT2) = 320/480 = 2/3
    DT3 score .70 rows 60-79 cols 60-79 -> crowd IoU = inter/area(dt)
                                           = 400/400 = 1.0 -> matches the
                                           crowd gt, ignored at every thr
  image 2:
    GT4 rows 0-96 cols 0-96    area 9409 (large)
    DT4 score .90 rows 0-96 cols 0-89 -> IoU = 8730/9409 ~ .9278
    DT5 score .60 rows 98-99 cols 0-9  area 20 (small), IoU 0 -> FP
  image 3:
    GT6 rows 0-9 cols 0-9      area 100 (small), iscrowd=1
    DT6 score .55 rows 0-4 cols 0-9 -> crowd IoU = 50/50 = 1.0 -> ignored

Derivation, area=all, maxDets=100. Non-ignored gts: GT1, GT2, GT4 ->
npig=3 (crowd GT3/GT6 ignored). Counted dets by score: [DT1, DT4, DT2,
DT5] (DT3/DT6 crowd-matched -> ignored). Matches survive up to:
DT1 t<=.80 (9/11=.8182), DT4 t<=.90 (.9278), DT2 t<=.65 (2/3).

  t in {.50,.55,.60,.65} (4 thrs): tp flags [1,1,1,0]
    cum tp [1,2,3,3], fp [0,0,0,1]; recall [1/3,2/3,1,1]
    101-pt sampled precision: recall reaches 1.0 with precision 1.0 at the
    first recall==1 entry (searchsorted 'left'), so every sample reads 1.0
    -> AP(t) = 1.0
  t in {.70,.75,.80} (3 thrs): DT2 is FP: flags [1,1,0,0]
    recall [1/3,2/3,2/3,2/3]; precision [1,1,2/3,1/2]
    samples: r<=1/3 -> 1.0 (34 pts: .00-.33), r in (.33,2/3] -> 1.0
    (33 pts: .34-.66), r>2/3 -> 0  -> AP(t) = 67/101
  t in {.85,.90} (2 thrs): DT1 also FP: flags [0,1,0,0]
    cum tp [0,1,1,1], fp [1,1,2,3]; recall [0,1/3,1/3,1/3]
    precision [0,.5,1/3,.25] -> monotone-from-right [.5,.5,1/3,.25]
    samples: r=0 -> .5 (1 pt), r in (0,1/3] -> .5 (33 pts: .01-.33)
    -> AP(t) = 34*0.5/101 = 17/101
  t = .95: no matches -> AP(t) = 0

  AP   = (4*1 + 3*67/101 + 2*17/101 + 0)/10 = 639/1010
  AP50 = 1.0,   AP75 = 67/101

area=small ([0, 1024)): npig=2 (GT1, GT2; GT4 large -> ignored). DT4
matches the ignored GT4 (t<=.9) or is unmatched-outside-range (t=.95),
ignored either way; counted dets: [DT1, DT2, DT5].
  t in {.50..}.65} (4): flags [1,1,0]; recall [.5,1,1] -> all samples 1.0
    -> AP(t)=1
  t in {.70,.75,.80} (3): flags [1,0,0]; recall [.5,.5,.5];
    precision [1,.5,1/3]; samples r<=.5 -> 1.0 (51 pts) -> AP(t)=51/101
  t in {.85,.90,.95}: no tps -> 0
  AP_small = (4 + 3*51/101)/10 = 557/1010
  (the r=.50 sample lands exactly on recall 1/2; both 0.5 values are
  exact binary doubles and numpy's linspace(0,1,101)[50] == 0.5 exactly —
  asserted below — so searchsorted includes it deterministically)

area=medium: only GT3 (crowd -> ignored) -> npig=0 -> AP_medium = NaN
area=large: npig=1 (GT4); only DT4 ever counted (others ignored:
  matched-to-ignored or unmatched-outside-range)
  t<=.90 (9 thrs): recall [1], precision [1] -> AP(t)=1
  t=.95: DT4 unmatched -> ignored (area 8730 outside large) -> AP(t)=0
  AP_large = 0.9

AR@100 = AR@10 (<=10 dets/img) = mean final recall
  = (4*1 + 3*2/3 + 2*1/3 + 0)/10 = 2/3
AR@1: top-1 det per image = DT1, DT4, DT6(ignored); npig=3
  t<=.80 (7): 2/3;  t in {.85,.90}: 1/3;  t=.95: 0
  AR@1 = (7*2/3 + 2*1/3)/10 = 8/15
AR_small = (4*1 + 3*1/2)/10 = 0.55   (DT1+DT2 then DT1 only)
AR_medium = NaN,  AR_large = (9*1)/10 = 0.9
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientsam3_tpu.eval.coco_format import mask_to_rle, rle_to_mask

H = W = 100


def rect(r0, r1, c0, c1):
    m = np.zeros((H, W), bool)
    m[r0 : r1 + 1, c0 : c1 + 1] = True
    return m


def main():
    # float-boundary facts the derivation leans on
    rt = np.linspace(0, 1, 101)
    assert rt[50] == 0.5 and rt[25] != 1 / 3  # exact-.5 sample; no 1/3 sample
    assert 9 / 11 > 0.80 and 9 / 11 < 0.85
    assert 2 / 3 > 0.65 and 2 / 3 < 0.70
    assert 8730 / 9409 > 0.90 and 8730 / 9409 < 0.95

    gts = [
        dict(id=1, image_id=1, mask=rect(0, 9, 0, 9), iscrowd=0),
        dict(id=2, image_id=1, mask=rect(20, 39, 20, 39), iscrowd=0),
        dict(id=3, image_id=1, mask=rect(60, 99, 60, 99), iscrowd=1),
        dict(id=4, image_id=2, mask=rect(0, 96, 0, 96), iscrowd=0),
        dict(id=6, image_id=3, mask=rect(0, 9, 0, 9), iscrowd=1),
    ]
    dts = [
        dict(image_id=1, score=0.95, mask=rect(0, 9, 1, 10)),
        dict(image_id=1, score=0.85, mask=rect(20, 39, 24, 43)),
        dict(image_id=1, score=0.70, mask=rect(60, 79, 60, 79)),
        dict(image_id=2, score=0.90, mask=rect(0, 96, 0, 89)),
        dict(image_id=2, score=0.60, mask=rect(98, 99, 0, 9)),
        dict(image_id=3, score=0.55, mask=rect(0, 4, 0, 9)),
    ]

    def enc(m):
        rle = mask_to_rle(m)
        assert (rle_to_mask(rle) == m).all()  # round-trip sanity
        return rle

    fixture = {
        "derivation": "analytic; see scripts/make_pycoco_analytic_fixture.py",
        "gt": {
            "images": [{"id": i, "height": H, "width": W} for i in (1, 2, 3)],
            "annotations": [
                {
                    "id": g["id"],
                    "image_id": g["image_id"],
                    "category_id": 1,
                    "segmentation": enc(g["mask"]),
                    "iscrowd": g["iscrowd"],
                    "area": int(g["mask"].sum()),
                }
                for g in gts
            ],
        },
        "dt": [
            {
                "image_id": d["image_id"],
                "category_id": 1,
                "score": d["score"],
                "segmentation": enc(d["mask"]),
            }
            for d in dts
        ],
        "metrics": {
            "AP": 639 / 1010,
            "AP50": 1.0,
            "AP75": 67 / 101,
            "AP_small": 557 / 1010,
            "AP_medium": float("nan"),
            "AP_large": 0.9,
            "AR@1": 8 / 15,
            "AR@10": 2 / 3,
            "AR@100": 2 / 3,
            "AR_small": 0.55,
            "AR_medium": float("nan"),
            "AR_large": 0.9,
        },
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "pycoco_oracle.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fixture, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
