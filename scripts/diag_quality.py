#!/usr/bin/env python
"""Diagnose the overfit-to-quality detector training: train the tiny config
from scripts/train_overfit_quality.py for N steps on the default (TPU)
backend, then run ONE batched forward over all (image, query) pairs and
print raw presence/score/box diagnostics plus cgF1 — so the failure mode
(scores under threshold vs wrong localization vs no query discrimination)
is visible instead of a single low cgF1 number.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "EFFICIENTSAM3_BPE_PATH",
    "/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--embed", type=int, default=None)
    ap.add_argument("--name", default=None)
    ap.add_argument("--save", default=None, help="checkpoint dir to write")
    ap.add_argument("--presence-weight", type=float, default=60.0)
    args = ap.parse_args()

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.eval.fixtures import make_shapes_fixture
    from efficientsam3_tpu.eval.gold import evaluate_cgf1_files
    from efficientsam3_tpu.eval.coco_format import mask_to_rle, rle_encode_string
    from efficientsam3_tpu.ops.interpolate import resize_bilinear
    from train_overfit_quality import (
        MODEL_CFG, build_fixture_batch, train_detector,
    )

    res = args.res or MODEL_CFG["res"]
    embed = args.embed or MODEL_CFG["embed"]
    name = args.name or MODEL_CFG["name"]
    ctx = MODEL_CFG["ctx"]
    model, _tracker = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name=name,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=ctx,
        embed_size=embed,
    )
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1, ctx), jnp.int32),
        Prompt.empty(1, 8, 8),
    )
    batch, images, gt, pairs = build_fixture_batch(ctx, res)
    size = images.shape[1]
    print(f"fixture: {len(pairs)} pairs, "
          f"{int(np.asarray(batch['targets']['valid']).sum())} instances, "
          f"train res {res}, grid {embed}x{embed}")

    t0 = time.time()
    variables = train_detector(
        model, variables, batch, args.steps, args.scan, args.lr,
        loss_weights={"presence_loss": args.presence_weight},
    )
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    if args.save:
        from efficientsam3_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(os.path.join(args.save, "detector"), args.steps,
                        jax.device_get(variables))

    # one batched forward over every pair (the training batch IS the eval set)
    b = batch["images"].shape[0]
    fwd = jax.jit(lambda v, im, tk: model.apply(
        v, im, tk, Prompt.empty(b, 4, 4)))
    out = fwd(variables, batch["images"], batch["tokens"])
    logits = np.asarray(out["pred_logits"], np.float32)[..., 0]  # (B, Q)
    pres = 1 / (1 + np.exp(-np.asarray(
        out["presence_logit_dec"], np.float32).reshape(b)))
    boxes = np.asarray(out["pred_boxes"], np.float32)  # (B, Q, 4) cxcywh
    masks = np.asarray(out["pred_masks"], np.float32)  # (B, Q, h, w)
    probs = 1 / (1 + np.exp(-logits)) * pres[:, None]

    by_pair = {}
    for a in gt["annotations"]:
        by_pair.setdefault(a["image_id"], []).append(a)

    print("\npair | query | n_gt | presence | top5 probs")
    for j, (pair_id, i, q) in enumerate(pairs):
        n_gt = len(by_pair.get(pair_id, []))
        top = np.sort(probs[j])[::-1][:5]
        gtb = [np.round(a["bbox"], 0).tolist() for a in by_pair.get(pair_id, [])]
        k = np.argsort(probs[j])[::-1][:max(n_gt, 1)]
        pb = []
        for qq in k:
            cx, cy, ww, hh = boxes[j, qq] * size
            pb.append([round(cx - ww / 2), round(cy - hh / 2),
                       round(ww), round(hh)])
        print(f"{pair_id:3d} | {q:13s} | {n_gt} | {pres[j]:.3f} | "
              f"{np.round(top, 3)} | gt={gtb} pred={pb}")

    # cgF1 through the real record pipeline (mask upsample like processor)
    records = []
    hm, wm = masks.shape[-2:]
    up = np.asarray(resize_bilinear(
        jnp.asarray(masks.reshape(b * masks.shape[1], 1, hm, wm)),
        (size, size)).reshape(b, masks.shape[1], size, size))
    for j, (pair_id, i, q) in enumerate(pairs):
        keep = np.where(probs[j] > 0.5)[0]
        for qq in keep:
            m = up[j, qq] > 0
            rle = mask_to_rle(m)
            rle["counts"] = rle_encode_string(rle["counts"])
            cx, cy, ww, hh = boxes[j, qq] * size
            records.append(dict(
                image_id=pair_id, category_id=1, score=float(probs[j, qq]),
                bbox=[float(cx - ww / 2), float(cy - hh / 2),
                      float(ww), float(hh)],
                segmentation=rle))
    print(f"\n{len(records)} records above 0.5")
    cg = evaluate_cgf1_files(records, [gt], iou_type="segm")
    print({k: round(v, 4) for k, v in cg.items() if isinstance(v, float)})


if __name__ == "__main__":
    main()
