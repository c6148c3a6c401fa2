"""Train-time interactive-steps loop (geometric prompt refinement).

Mirrors the reference training loop structure (sam3/sam3/model/
sam3_image.py:559: `for cur_step in range(num_interactive_steps + 1)` with
`interactive_prompt_sampler.sample(geo_prompt, find_target, previous_out)`;
the sampler class itself is absent from the released tree, so the sampling
follows the geometry-finetune refinement recipe the reference does ship:
corrective clicks from prediction-error regions,
stage1_geometry_finetune/train_geometry_finetune.py:68 +
model/sam3_tracker_utils.py:284 get_next_point "center" mode).

TPU-first: the WHOLE loop - forwards, error-region click sampling via the
Euclidean distance transform, loss over every step's outputs - is one
jitted program with static shapes (steps unrolled; prompts are fixed-width
Prompt pytrees whose padded slots fill up as steps progress)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.geometry import Prompt
from efficientsam3_tpu.ops.edt import edt
from efficientsam3_tpu.train.losses import sam3_detection_loss


def sample_correction_click(prev_masks, prev_logits, tgt_masks, tgt_valid):
    """Per-sample corrective click from the largest prediction error.

    prev_masks: (B, Q, h, w) mask logits from the previous step.
    tgt_masks: (B, T, H, W) float {0,1}; tgt_valid (B, T).
    Returns (xy (B, 2) normalized [0,1], labels (B,) int, has_click (B,)).

    The click lands at the point deepest inside the error region (EDT
    argmax, reference get_next_point "center" mode / geometry-finetune
    refinement): label 1 for false-negative area, 0 for false-positive.
    """
    b, q, h, w = prev_masks.shape
    scores = prev_logits[..., 0]  # (B, Q)
    best_q = jnp.argmax(scores, axis=1)  # (B,)
    pred = jnp.take_along_axis(
        prev_masks, best_q[:, None, None, None], axis=1
    )[:, 0] > 0  # (B, h, w)

    # union of valid GT masks, downsampled to the prediction grid
    gt = (tgt_masks * tgt_valid[:, :, None, None]).max(axis=1)  # (B, H, W)
    if gt.shape[-2:] != (h, w):
        gt = jax.image.resize(gt, (b, h, w), "linear")
    gt = gt > 0.5

    fn_area = gt & ~pred
    fp_area = pred & ~gt
    error = fn_area | fp_area

    def per_sample(err, fn):
        dist = edt(err)  # (h, w) distance to non-error
        idx = jnp.argmax(dist.reshape(-1))
        y, x = idx // w, idx % w
        label = fn[y, x].astype(jnp.int32)  # 1 = add, 0 = remove
        xy = jnp.stack([(x + 0.5) / w, (y + 0.5) / h])
        return xy, label, err.any()

    xy, labels, has_err = jax.vmap(per_sample)(error, fn_area)
    return xy, labels, has_err


def add_click_to_prompt(prompt: Prompt, slot: int, xy, labels, has_click):
    """Write a correction click into a fixed Prompt slot (masked where the
    previous step had no error)."""
    points = prompt.points.at[:, slot].set(xy)
    point_labels = prompt.point_labels.at[:, slot].set(labels)
    point_mask = prompt.point_mask.at[:, slot].set(~has_click)
    return prompt.replace(
        points=points, point_labels=point_labels, point_mask=point_mask
    )


def interactive_grounding_loss(
    model,
    variables,
    images,
    tokens,
    prompt: Prompt,
    targets,
    *,
    num_interactive_steps: int = 1,
    rng: Optional[jax.Array] = None,
    loss_kwargs: Optional[dict] = None,
    train: bool = True,
    mutable=("batch_stats",),
):
    """Unrolled interactive training forward: image/text encoded ONCE, then
    `num_interactive_steps + 1` grounding passes; after each pass a
    corrective click (from that pass's error region) extends the prompt.
    Losses from every step accumulate (Sam3LossWrapper iterates
    ALL_STEPS_PER_STAGE, sam3_loss.py:163).

    Returns (total_loss, (parts_per_step, mutated_variables))."""
    loss_kwargs = loss_kwargs or {}
    rngs = {"dropout": rng} if (train and rng is not None) else {}

    img_out, mut = model.apply(
        variables, images, train=train, method=model.encode_image,
        mutable=list(mutable), rngs=rngs,
    )
    (text_memory, text_mask), mut2 = model.apply(
        dict(variables, **mut), tokens, train=train, method=model.encode_text,
        mutable=list(mutable), rngs=rngs,
    )
    mut = {**mut, **mut2}

    total = 0.0
    parts_per_step = []
    cur_prompt = prompt
    n_point_slots = prompt.points.shape[1]
    for step in range(num_interactive_steps + 1):
        out, mut = model.apply(
            dict(variables, **mut),
            img_out["fpn"], img_out["pos"], text_memory, text_mask,
            cur_prompt, train=train, method=model.ground,
            mutable=list(mutable), rngs=rngs,
        )
        step_rng = None if rng is None else jax.random.fold_in(rng, step)
        loss, parts = sam3_detection_loss(
            out, targets, rng=step_rng, **loss_kwargs
        )
        total = total + loss
        parts_per_step.append(parts)
        if step < num_interactive_steps:
            slot = n_point_slots - 1 - step  # fill pad slots from the end
            xy, labels, has_click = sample_correction_click(
                jax.lax.stop_gradient(out["pred_masks"]),
                jax.lax.stop_gradient(out["pred_logits"]),
                targets["masks"], targets["valid"],
            )
            cur_prompt = add_click_to_prompt(
                cur_prompt, slot, xy, labels, has_click
            )
    return total, (parts_per_step, mut)
