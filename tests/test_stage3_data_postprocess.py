"""Stage-3 mixed dataset + postprocessors."""

import json

import numpy as np

from efficientsam3_tpu.eval.coco_format import CocoDataset, rle_to_mask
from efficientsam3_tpu.eval.postprocess import postprocess_image, postprocess_video


def _toy_coco(tmp_path, name, n_imgs=3):
    from PIL import Image

    root = tmp_path / name
    root.mkdir()
    images, anns = [], []
    rng = np.random.default_rng(hash(name) % 2**31)
    aid = 1
    for i in range(n_imgs):
        fn = f"{i}.png"
        Image.fromarray((rng.random((40, 50, 3)) * 255).astype(np.uint8)).save(
            root / fn
        )
        images.append({"id": i, "file_name": fn, "height": 40, "width": 50})
        anns.append(
            {
                "id": aid,
                "image_id": i,
                "category_id": 1 + (i % 2),
                "bbox": [5, 5, 20, 15],
                "segmentation": [[5, 5, 25, 5, 25, 20, 5, 20]],
                "iscrowd": 0,
            }
        )
        aid += 1
    d = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    return CocoDataset(d), str(root)


def test_stage3_mixed_dataset(tmp_path):
    from efficientsam3_tpu.data.stage3_mixed import Source, Stage3MixedDataset

    ds1, root1 = _toy_coco(tmp_path, "src1")
    ds2, root2 = _toy_coco(tmp_path, "src2")
    mixed = Stage3MixedDataset(
        [Source("a", ds1, root1, 1.0), Source("b", ds2, root2, 2.0)],
        image_size=64, max_targets=4, mask_size=16, seed=1,
    )
    assert len(mixed) == 6
    s = mixed.sample()
    assert s["image"].shape == (64, 64, 3)
    assert s["boxes"].shape == (4, 4)
    if s["valid"].any():
        assert (s["boxes"][s["valid"]] >= 0).all()
        assert (s["boxes"][s["valid"]] <= 1).all()
        assert s["masks"][0].sum() > 0

    def tok(texts, ctx):
        return np.zeros((len(texts), ctx), np.int32)

    batch = next(mixed.batches(tok, batch_size=2, context_length=8))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["targets"]["boxes"].shape == (2, 4, 4)


def test_postprocess_image_and_video():
    nq = 6
    outputs = {
        "pred_logits": np.linspace(-2, 3, nq)[:, None],
        "pred_boxes": np.tile([0.5, 0.5, 0.2, 0.2], (nq, 1)),
        "pred_masks": np.full((nq, 8, 8), 5.0),
        "presence_logit_dec": np.asarray([2.0]),
    }
    recs = postprocess_image(outputs, image_id=7, orig_hw=(16, 16), top_k=3)
    assert len(recs) == 3
    assert recs[0]["score"] >= recs[1]["score"]
    assert recs[0]["image_id"] == 7
    m = rle_to_mask(recs[0]["segmentation"])
    assert m.shape == (16, 16) and m.all()

    frames = [
        {"obj_ids": [1], "masks": np.ones((1, 8, 8), bool), "scores": [0.9]},
        {"obj_ids": [1, 2], "masks": np.ones((2, 8, 8), bool), "scores": [0.8, 0.6]},
    ]
    tracks = postprocess_video(frames, video_id=3)
    assert len(tracks) == 2
    t1 = next(t for t in tracks if t["track_id"] == 1)
    assert len(t1["segmentations"]) == 2 and t1["segmentations"][0] is not None
    t2 = next(t for t in tracks if t["track_id"] == 2)
    assert t2["segmentations"][0] is None  # absent in frame 0


def test_stage3_mixed_dataset_augmented(tmp_path):
    from efficientsam3_tpu.data.stage3_mixed import Source, Stage3MixedDataset

    ds1, root1 = _toy_coco(tmp_path, "aug_src")
    mixed = Stage3MixedDataset(
        [Source("a", ds1, root1, 1.0)],
        image_size=64, max_targets=4, mask_size=16, seed=2, augment=True,
        negative_prompt_prob=0.0,
    )
    for _ in range(6):
        s = mixed.sample()
        assert s["image"].shape == (64, 64, 3)
        assert s["boxes"].shape == (4, 4)
        n = int(s["valid"].sum())
        if n:
            assert (s["boxes"][:n] >= -1e-6).all()
            assert (s["boxes"][:n] <= 1 + 1e-6).all()
            # mask and box agree after augmentation
            assert s["masks"][:n].sum() > 0


def test_refcoco_parquet_source(tmp_path):
    import pandas as pd
    from PIL import Image

    from efficientsam3_tpu.data.stage3_mixed import (
        RefCocoParquetSource,
        Stage3MixedDataset,
    )

    root = tmp_path / "ref"
    root.mkdir()
    Image.fromarray(np.zeros((40, 50, 3), np.uint8)).save(root / "r0.png")
    df = pd.DataFrame(
        {
            "phrase": ["the red thing", "a dog"],
            "file_name": ["r0.png", "r0.png"],
            "bbox": [[5.0, 5.0, 20.0, 15.0], [2.0, 2.0, 10.0, 10.0]],
        }
    )
    pq = root / "anno.parquet"
    df.to_parquet(pq)
    src = RefCocoParquetSource(str(pq), image_root=str(root), weight=3.0)
    assert len(src) == 2
    img, phrase, boxes, masks = src.load(0)
    assert phrase == "the red thing"
    assert boxes.shape == (1, 4)

    mixed = Stage3MixedDataset(
        [], image_size=64, max_targets=4, mask_size=None, seed=0,
        phrase_sources=[src],
    )
    s = mixed.sample()
    assert isinstance(s["prompt_text"], str)
    assert s["valid"].sum() == 1
