#!/usr/bin/env python
"""Overfit-to-quality proof: train the full model on the eval fixture until
the FULL inference path (processor -> postprocess -> evaluators) reports
high quality — the "does it actually segment" demonstration that loss-
decrease smoke tests don't give.

Two phases, both with the real training machinery:
  1. Detector: stage-3 train step (train/stage3.py — real loss stack incl.
     deep supervision, o2m/DAC, device-side Hungarian matching) on the
     shapes fixture's (image, text-query) pairs, train_all=True because
     from-scratch runs have no pretrained heads to freeze.
  2. SAM heads: box-prompt mask training through the SAM1-task path
     (no-mem conditioning -> prompt encoder -> mask decoder), SAM-style
     min-over-multimask BCE+dice + IoU-head MSE + object-score BCE —
     makes box_prompt_miou (eval/eval_coco.py analog) non-trivial too.

The training loop runs K steps per dispatch inside one jitted lax.scan
program (the matcher is device-side, ops/hungarian.py, so the whole update
scans). Checkpoints go to --out via utils/checkpoint (orbax); evaluate with

    python scripts/eval_quality.py --trained <out> --out QUALITY_r3.json

which loads them into the SAME tiny config this script trains.

Mirrors the reference's smoke criterion (README_stage3.md:121-132) and its
gold cgF1 table (sam3/scripts/eval/gold/README.md) as the quality bar.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "EFFICIENTSAM3_BPE_PATH",
    "/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
)

import numpy as np

import jax
import jax.numpy as jnp


# The overfit fixture: 224px with 40-88px shapes. EfficientViT's final
# stage is stride 32, so the 1008-flagship sees objects on a ~32x32 native
# grid; at a 112px training resolution that grid is 4x4 and sub-cell
# objects cannot be localized (measured: boxes never pass IoU ~0.5, and the
# IoU-aware BCE soft target then caps scores below the 0.5 keep threshold).
# 224px/embed-16 with proportionally larger shapes keeps the same
# object-to-cell ratio as the flagship while staying minutes-cheap.
FIXTURE = dict(num_images=8, size=224, seed=3, r_lo=20, r_hi=44)
MODEL_CFG = dict(res=224, embed=16, ctx=16, name="b0")


def build_fixture_batch(ctx: int, res: int):
    """The SAME fixture eval_quality.py scores (see FIXTURE), as one full
    training batch of (image, query) pairs."""
    from efficientsam3_tpu.eval.coco_format import ann_to_mask
    from efficientsam3_tpu.eval.fixtures import make_shapes_fixture
    from efficientsam3_tpu.utils.tokenizer import ClipTokenizer

    images, gt, pairs = make_shapes_fixture(**FIXTURE)
    size = images.shape[1]
    tokenizer = ClipTokenizer()

    by_pair = {}
    for a in gt["annotations"]:
        by_pair.setdefault(a["image_id"], []).append(a)

    t_max = max(3, max((len(v) for v in by_pair.values()), default=1))
    imgs, toks, boxes, valid, masks = [], [], [], [], []
    for pair_id, i, q in pairs:
        img = images[i].astype(np.float32) / 255.0
        imgs.append((img - 0.5) / 0.5)
        toks.append(tokenizer([q], ctx)[0])
        bx = np.zeros((t_max, 4), np.float32)
        vl = np.zeros((t_max,), bool)
        mk = np.zeros((t_max, size, size), np.float32)
        for t, a in enumerate(by_pair.get(pair_id, [])):
            x, y, w, h = a["bbox"]
            bx[t] = [(x + w / 2) / size, (y + h / 2) / size, w / size, h / size]
            vl[t] = True
            mk[t] = ann_to_mask(a, size, size)
        boxes.append(bx)
        valid.append(vl)
        masks.append(mk)

    if res != size:
        import jax.image

        imgs = [
            np.asarray(
                jax.image.resize(jnp.asarray(im), (res, res, 3), "linear",
                                 antialias=True)
            )
            for im in imgs
        ]
    batch = {
        "images": jnp.asarray(np.stack(imgs)),
        "tokens": jnp.asarray(np.stack(toks), jnp.int32),
        "targets": {
            "boxes": jnp.asarray(np.stack(boxes)),
            "valid": jnp.asarray(np.stack(valid)),
            "masks": jnp.asarray(np.stack(masks)),
            "is_exhaustive": jnp.ones((len(pairs),), bool),
        },
    }
    return batch, images, gt, pairs


def train_detector(model, variables, batch, steps, scan_len, lr,
                   loss_weights=None):
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.train.stage3 import (
        Stage3Config,
        make_stage3_optimizer,
        stage3_train_step,
    )

    # cosine decay to ~0 at `steps`: the overfit proof needs the late
    # low-lr phase to tighten boxes — score = sigmoid(logit) x presence is
    # capped near the matched-box IoU by the IoU-aware BCE soft target, so
    # detections only clear the 0.5 keep-threshold once boxes are tight
    cfg = Stage3Config(
        vision_lr=lr, text_lr=lr, train_all=True, weight_decay=1e-4,
        warmup_steps=200, timescale=steps, schedule="cosine",
    )
    tx = make_stage3_optimizer(cfg, variables["params"])
    opt_state = tx.init(variables["params"])
    b = batch["images"].shape[0]
    prompt = Prompt.empty(b, 4, 4)
    key = jax.random.PRNGKey(42)

    @jax.jit
    def run_chunk(variables, opt_state, step0, images, tokens, tb, tv, tm):
        def body(carry, i):
            v, o = carry
            full = {
                "images": images, "tokens": tokens, "prompt": prompt,
                "rng": jax.random.fold_in(key, step0 + i),
                "targets": {
                    "boxes": tb, "valid": tv, "masks": tm,
                    "is_exhaustive": jnp.ones((b,), bool),
                },
            }
            v, o, m = stage3_train_step(
                model, tx, v, o, full, loss_weights=loss_weights
            )
            return (v, o), m

        (variables, opt_state), metrics = jax.lax.scan(
            body, (variables, opt_state), jnp.arange(scan_len)
        )
        return variables, opt_state, metrics

    args = (
        batch["images"], batch["tokens"], batch["targets"]["boxes"],
        batch["targets"]["valid"], batch["targets"]["masks"],
    )
    t0 = time.time()
    for step0 in range(0, steps, scan_len):
        variables, opt_state, metrics = run_chunk(
            variables, opt_state, step0, *args
        )
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        ls = metrics["loss"]
        parts = sorted(
            ((k[5:], float(v[-1])) for k, v in metrics.items()
             if k.startswith("loss_")),
            key=lambda kv: -kv[1],
        )[:4]
        print(
            f"[detector] step {step0 + scan_len:5d}/{steps} "
            f"loss {ls[-1]:.4f} (chunk mean {ls.mean():.4f}) "
            f"gnorm {metrics['grad_norm'][-1]:.2f} "
            f"top[{', '.join(f'{k}={v:.2f}' for k, v in parts)}] "
            f"{time.time() - t0:.0f}s",
            flush=True,
        )
        if not np.isfinite(ls).all():
            first = int(np.argmax(~np.isfinite(ls)))
            bad = {
                k: float(v[first])
                for k, v in metrics.items()
                if not np.isfinite(v[first])
            }
            raise FloatingPointError(
                f"non-finite loss at step {step0 + first}: components "
                f"{bad}; previous-step parts "
                f"{({k: round(float(v[max(first - 1, 0)]), 4) for k, v in metrics.items()})}"
            )
    return variables


def train_sam_heads(model, tracker, variables, tvars, images, gt,
                    steps, scan_len, lr):
    """Phase 2: box-prompted SAM-head training on the fixture instances.

    SAM-style multimask supervision: per instance, BCE+dice on EACH of the
    3 multimask outputs, backprop only the best (min-loss) one; IoU head
    regressed to the actual (thresholded) IoUs; object-score BCE toward 1
    (every prompt contains an object) — reference trains these heads inside
    the tracker (sam3_tracker_base.py) with the same recipe lineage (SAM).
    """
    import optax

    from efficientsam3_tpu.eval.coco_format import ann_to_mask
    from efficientsam3_tpu.ops.focal_loss import dice_loss, optax_bce
    from efficientsam3_tpu.ops.interpolate import resize_bilinear

    size = images.shape[1]
    res = tracker.image_size
    fs, d = tracker.feat_size, tracker.d_model

    # precompute frozen image features once per image
    feats = jax.jit(
        lambda v, im: model.apply(v, im, method=model.encode_image)
    )
    toks_l, s0_l, s1_l = [], [], []
    hrc = jax.jit(
        lambda tv, a, b2: tracker.apply(
            tv, a, b2,
            method=lambda m, x, y: m.sam_mask_decoder.high_res_convs(x, y),
        )
    )
    for i in range(images.shape[0]):
        im = images[i].astype(np.float32) / 255.0
        im = jax.image.resize(
            jnp.asarray(im), (res, res, 3), "linear", antialias=True
        )
        out = feats(variables, ((im - 0.5) / 0.5)[None])
        fpn = out["sam2_fpn"]
        s0, s1 = hrc(tvars, fpn[0], fpn[1])
        toks_l.append(np.asarray(fpn[2].reshape(1, fs * fs, d)))
        s0_l.append(np.asarray(s0))
        s1_l.append(np.asarray(s1))

    # per-annotation training rows (box prompt in model pixel coords)
    rows_tok, rows_s0, rows_s1, rows_box, rows_mask = [], [], [], [], []
    by_img = {}
    for a in gt["annotations"]:
        info = next(im for im in gt["images"] if im["id"] == a["image_id"])
        by_img.setdefault(info["image_index"], []).append(a)
    for i, anns in by_img.items():
        for a in anns:
            x, y, w, h = a["bbox"]
            sc = res / size
            rows_box.append([x * sc, y * sc, (x + w) * sc, (y + h) * sc])
            m = ann_to_mask(a, size, size).astype(np.float32)
            rows_mask.append(m)
            rows_tok.append(toks_l[i][0])
            rows_s0.append(s0_l[i][0])
            rows_s1.append(s1_l[i][0])
    n = len(rows_box)
    print(f"[sam-heads] {n} box-prompted instances")
    tok = jnp.asarray(np.stack(rows_tok))
    s0 = jnp.asarray(np.stack(rows_s0))
    s1 = jnp.asarray(np.stack(rows_s1))
    boxes = jnp.asarray(np.stack(rows_box), jnp.float32)
    gts = jnp.asarray(np.stack(rows_mask))

    # box -> 2 corner points labeled 2/3 (sam1_task_predictor.py:385-396)
    coords = jnp.stack([boxes[:, :2], boxes[:, 2:]], axis=1)  # (N, 2, 2)
    labels = jnp.broadcast_to(jnp.asarray([[2, 3]], jnp.int32), (n, 2))

    tx = optax.chain(
        optax.clip_by_global_norm(5.0), optax.adamw(lr, weight_decay=1e-4)
    )
    opt_state = tx.init(tvars["params"])

    def loss_fn(params, rng):
        v = dict(tvars, params=params)
        cond = tracker.apply(v, tok, method=tracker.no_mem_features)
        pix = cond.reshape(n, fs, fs, d)
        heads = tracker.apply(
            v, pix, coords, labels, (s0, s1), True,
            method=tracker.forward_sam_heads,
        )
        mm = heads["low_res_multimasks"]  # (N, 3, h, h) — NO_OBJ-gated
        k = mm.shape[1]
        up = resize_bilinear(
            mm.reshape(n * k, 1, *mm.shape[-2:]), (size, size)
        ).reshape(n, k, size, size)
        tg = jnp.broadcast_to(gts[:, None], up.shape)
        flat_p = up.reshape(n * k, -1)
        flat_t = tg.reshape(n * k, -1)
        bce = optax_bce(flat_p, flat_t).mean(-1).reshape(n, k)
        dl = dice_loss(
            up.reshape(n * k, 1, size, size), tg.reshape(n * k, 1, size, size)
        ).reshape(n, k)
        per = bce + dl
        best = jnp.argmin(jax.lax.stop_gradient(per), axis=1)
        mask_loss = jnp.take_along_axis(per, best[:, None], 1).mean()
        # IoU head vs actual thresholded IoUs
        inter = ((up > 0) & (tg > 0.5)).sum((-1, -2))
        union = ((up > 0) | (tg > 0.5)).sum((-1, -2))
        actual_iou = inter / jnp.maximum(union, 1)
        iou_mse = jnp.mean(
            (heads["ious"] - jax.lax.stop_gradient(actual_iou)) ** 2
        )
        obj_bce = optax_bce(
            heads["object_score_logits"],
            jnp.ones_like(heads["object_score_logits"]),
        ).mean()
        return mask_loss + iou_mse + obj_bce, {
            "mask": mask_loss, "iou": iou_mse, "obj": obj_bce,
        }

    @jax.jit
    def run_chunk(params, opt_state, step0):
        def body(carry, i):
            p, o = carry
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, jax.random.fold_in(jax.random.PRNGKey(5), step0 + i)
            )
            up, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, up), o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(scan_len)
        )
        return params, opt_state, losses

    params = tvars["params"]
    t0 = time.time()
    for step0 in range(0, steps, scan_len):
        params, opt_state, losses = run_chunk(params, opt_state, step0)
        ls = np.asarray(losses)
        print(
            f"[sam-heads] step {step0 + scan_len:5d}/{steps} "
            f"loss {ls[-1]:.4f} {time.time() - t0:.0f}s",
            flush=True,
        )
    return dict(tvars, params=params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/overfit_quality")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--heads-steps", type=int, default=1000)
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--heads-lr", type=float, default=4e-4)
    # r3 missed the cgF1>=0.8 bar with IL_MCC 0.745: negative (image, query)
    # pairs weren't rejected — the presence token is the ONLY negative-pair
    # supervision (classification loss is presence-gated off for no-GT
    # samples, losses.iabce_classification_loss), so the overfit recipe
    # weights it harder than the stage-3 production default (20).
    ap.add_argument("--presence-weight", type=float, default=60.0)
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--embed", type=int, default=None)
    ap.add_argument("--name", default=None)
    args = ap.parse_args()

    import json

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.utils.checkpoint import save_checkpoint
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    # the exact eval_quality.py no-checkpoint config, with CLI overrides
    # (e.g. --res 504 --embed 36 --name b1 for the one-rung-toward-flagship
    # proof); the resolved config is written to <out>/config.json so
    # eval_quality.py builds the same graph
    res, embed, ctx, name = (
        args.res or MODEL_CFG["res"], args.embed or MODEL_CFG["embed"],
        MODEL_CFG["ctx"], args.name or MODEL_CFG["name"],
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump({"res": res, "embed": embed, "ctx": ctx, "name": name}, f)
    model, tracker = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name=name,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=ctx,
        embed_size=embed,
    )
    rng = jax.random.PRNGKey(0)
    # jitted init: eager init over the tunneled TPU backend is minutes of
    # per-op round-trips; jitted it is one compiled program
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1, ctx), jnp.int32),
        Prompt.empty(1, 8, 8),
    )
    tvars = init_tracker_variables(tracker, rng)

    batch, images, gt, pairs = build_fixture_batch(ctx, res)
    print(f"fixture: {len(pairs)} (image, query) pairs, "
          f"{int(np.asarray(batch['targets']['valid']).sum())} instances")

    variables = train_detector(
        model, variables, batch, args.steps, args.scan, args.lr,
        loss_weights={"presence_loss": args.presence_weight},
    )
    variables = jax.device_get(variables)
    save_checkpoint(os.path.join(args.out, "detector"), args.steps, variables)

    tvars = train_sam_heads(
        model, tracker, variables, tvars, images, gt,
        args.heads_steps, args.scan, args.heads_lr,
    )
    tvars = jax.device_get(tvars)
    save_checkpoint(os.path.join(args.out, "tracker"), args.heads_steps, tvars)
    print(f"saved checkpoints under {args.out}")


if __name__ == "__main__":
    main()
