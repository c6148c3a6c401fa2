"""Data engine: VLM pseudo-label pipeline with the stub backend."""

import json

import numpy as np

from efficientsam3_tpu.data import engine


def _samples():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (100, 120, 3), np.uint8)
    return [
        {
            "image_id": 7,
            "width": 120,
            "height": 100,
            "image": img,
            "masks": [
                {"mask_id": "m0", "bbox_xywh": [5, 5, 40, 10], "area": 300},
                {"mask_id": "m1", "bbox_xywh": [60, 50, 40, 10], "area": 280},
                {"mask_id": "m2", "bbox_xywh": [10, 60, 8, 30], "area": 150},
            ],
        }
    ]


def test_text_utils():
    assert engine.normalize_label("  The Red, Fox! ") == "red fox"
    assert engine.normalize_label("a " + "w " * 20) == " ".join(["w"] * 10)
    assert engine.is_generic_label("An Object") and not engine.is_generic_label("fox")
    assert engine.extract_json('```json\n{"label": "x"}\n```') == {"label": "x"}
    lab, conf, amb, why = engine.parse_vlm_response("garbage not json")
    assert amb and conf == 0.0
    lab, conf, amb, _ = engine.parse_vlm_response(
        'blah {"label": "Cat", "confidence": 1.7} blah'
    )
    assert lab == "cat" and conf == 1.0 and not amb


def test_disambiguation():
    used = {"dog"}
    t1 = engine.disambiguate_label("dog", [0, 0, 10, 10], 100, 100, used)
    assert t1 == "upper left dog"
    used.add(t1)
    t2 = engine.disambiguate_label("dog", [5, 5, 10, 10], 100, 100, used)
    assert t2 == "upper left dog 2"
    assert engine.disambiguate_label("dog", [80, 80, 10, 10], 100, 100, used) == (
        "lower right dog"
    )


def test_label_masks_stub_and_grouping():
    recs = engine.label_masks(_samples(), vlm=engine.stub_vlm)
    assert len(recs) == 3
    assert all(not r["rejected"] for r in recs)
    assert all(r["label"] and not engine.is_generic_label(r["label"]) for r in recs)
    # m0/m1 are wide, m2 is tall -> stub labels differ by shape
    assert "wide" in recs[0]["label"] and "tall" in recs[2]["label"]

    # distinct strategy disambiguates duplicate labels within the image
    rows = engine.build_grouped_queries(recs, strategy="distinct")
    texts = [q["query_text"] for q in rows[7]["queries"]]
    assert len(texts) == len(set(texts)) == 3
    merged = engine.build_grouped_queries(recs, strategy="merge")
    assert sum(len(q["mask_ids"]) for q in merged[7]["queries"]) == 3


def test_rejection_paths():
    def bad_vlm(crop, system, user):
        return json.dumps({"label": "object", "confidence": 0.9})

    recs = engine.label_masks(_samples(), vlm=bad_vlm)
    assert all(r["rejected"] and r["reject_reason"] == "generic label" for r in recs)
    stats = engine.audit(recs)
    assert stats["num_accepted"] == 0 and stats["acceptance_rate"] == 0.0

    recs2 = engine.label_masks(_samples(), vlm=engine.stub_vlm, min_area_frac=0.5)
    assert all(r["reject_reason"] == "mask too small" for r in recs2)


def test_records_to_coco_feeds_stage3():
    from efficientsam3_tpu.eval.coco_format import CocoDataset

    recs = engine.label_masks(_samples(), vlm=engine.stub_vlm)
    coco = engine.records_to_coco(recs)
    assert len(coco["annotations"]) == 3
    ds = CocoDataset(coco)
    assert len(ds.images) == 1
    anns = ds.annotations(7)
    assert len(anns) == 3
    names = {c["name"] for c in coco["categories"]}
    assert all(not engine.is_generic_label(n) for n in names)

    stats = engine.audit(recs)
    assert stats["num_accepted"] == 3 and stats["num_unique_labels"] == len(names)
