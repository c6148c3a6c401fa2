"""Stage-3 mixed multi-source detection dataset.

Mirrors the reference Stage3MixedTextMaskDataset (stage3/data/
mixed_text_mask_dataset.py:424): multiple COCO-format sources (COCO, LVIS,
ODinW, RF100-VL, ...) are sampled by weight; each example is an
(image, text prompt from the category name, instances of that category)
find-query, with padded fixed-width targets ready for train/losses.py.

Host-side numpy; masks come from utils in eval/coco_format (polygon/RLE
without pycocotools).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

from efficientsam3_tpu.eval.coco_format import CocoDataset, ann_to_mask


@dataclasses.dataclass
class Source:
    name: str
    dataset: CocoDataset
    image_root: str
    weight: float = 1.0


class Stage3MixedDataset:
    """Sampled (image, prompt, targets) find-queries across sources."""

    def __init__(
        self,
        sources: Sequence[Source],
        image_size: int = 1008,
        max_targets: int = 40,
        mask_size: Optional[int] = 288,
        negative_prompt_prob: float = 0.2,
        seed: int = 0,
    ):
        self.sources = list(sources)
        self.image_size = image_size
        self.max_targets = max_targets
        self.mask_size = mask_size
        self.negative_prompt_prob = negative_prompt_prob
        self.rng = np.random.default_rng(seed)
        # (source_idx, image_id, category_id) triples with >=1 instance
        self.queries = []
        for si, src in enumerate(self.sources):
            for img_id in src.dataset.images:
                cats = {a["category_id"] for a in src.dataset.annotations(img_id)}
                for c in cats:
                    self.queries.append((si, img_id, c))
        weights = np.asarray(
            [self.sources[si].weight for si, _, _ in self.queries], np.float64
        )
        self.probs = weights / weights.sum()

    def __len__(self):
        return len(self.queries)

    def _load_image(self, src: Source, info: dict) -> np.ndarray:
        from PIL import Image

        path = os.path.join(src.image_root, info["file_name"])
        img = Image.open(path).convert("RGB")
        img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        return (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5

    def sample(self) -> dict:
        qi = self.rng.choice(len(self.queries), p=self.probs)
        si, img_id, cat_id = self.queries[qi]
        src = self.sources[si]
        info = src.dataset.images[img_id]
        h, w = info["height"], info["width"]
        image = self._load_image(src, info)

        # with some probability turn this into a NEGATIVE query: prompt a
        # category absent from the image (trains the presence head)
        negative = self.rng.random() < self.negative_prompt_prob
        if negative:
            present = {a["category_id"] for a in src.dataset.annotations(img_id)}
            absent = [c for c in src.dataset.categories if c not in present]
            if absent:
                cat_id = int(self.rng.choice(absent))
        prompt_text = src.dataset.categories[cat_id]["name"]

        anns = [] if negative else src.dataset.annotations(img_id, cat_id)
        anns = anns[: self.max_targets]
        boxes = np.zeros((self.max_targets, 4), np.float32)
        valid = np.zeros((self.max_targets,), bool)
        masks = (
            np.zeros((self.max_targets, self.mask_size, self.mask_size), np.float32)
            if self.mask_size
            else None
        )
        for i, ann in enumerate(anns):
            x, y, bw, bh = ann["bbox"]
            boxes[i] = [(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h]
            valid[i] = True
            if masks is not None and "segmentation" in ann:
                m = ann_to_mask(ann, h, w)
                from PIL import Image

                mm = Image.fromarray(m.astype(np.uint8) * 255).resize(
                    (self.mask_size, self.mask_size), Image.BILINEAR
                )
                masks[i] = (np.asarray(mm) > 127).astype(np.float32)
        out = {
            "image": image,
            "prompt_text": prompt_text,
            "boxes": boxes,
            "valid": valid,
            "source": src.name,
        }
        if masks is not None:
            out["masks"] = masks
        return out

    def batches(self, tokenizer, batch_size: int, context_length: int = 32):
        """Infinite batch iterator with tokenized prompts."""
        while True:
            samples = [self.sample() for _ in range(batch_size)]
            yield {
                "images": np.stack([s["image"] for s in samples]),
                "tokens": tokenizer(
                    [s["prompt_text"] for s in samples], context_length
                ),
                "targets": {
                    "boxes": np.stack([s["boxes"] for s in samples]),
                    "valid": np.stack([s["valid"] for s in samples]),
                    **(
                        {"masks": np.stack([s["masks"] for s in samples])}
                        if "masks" in samples[0]
                        else {}
                    ),
                },
            }
