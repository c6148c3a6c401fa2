"""Stage-1 geometry-aware finetune: prompt-in-the-loop distillation.

Mirrors the reference stage1_geometry_finetune (model.py:207
GeometryFinetuneModel, losses.py:213 GeometryFinetuningLoss,
train_geometry_finetune.py): the student trunk trains INSIDE the frozen
SAM3 pipeline — student embedding -> frozen neck -> geometry encoder ->
fusion -> decoder -> seg head, prompted with GT-derived boxes; the loss is
  embed MSE  (student embedding vs stored teacher embedding)
+ mask BCE+dice (student-path mask prediction vs the teacher-path mask).

TPU-first: the frozen heads run inside the same jitted step; freezing is
an optax label partition exactly like stage-3 (only `trunk` updates).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from efficientsam3_tpu.ops.focal_loss import dice_loss, optax_bce
from efficientsam3_tpu.train.stage1 import masked_mse


@dataclasses.dataclass(frozen=True)
class GeometryFinetuneConfig:
    embed_weight: float = 1.0
    mask_bce_weight: float = 1.0
    mask_dice_weight: float = 1.0
    lr: float = 2e-4
    weight_decay: float = 0.05
    grad_clip: float = 5.0


def geometry_labels(params):
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict(
        {p: ("trunk" if p[0] == "trunk" else "frozen") for p in flat}
    )


def make_geometry_optimizer(cfg: GeometryFinetuneConfig, params):
    return optax.multi_transform(
        {
            "trunk": optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
            ),
            "frozen": optax.set_to_zero(),
        },
        geometry_labels(params),
    )


def geometry_finetune_loss(
    model,  # Sam3ImageModel (student trunk + frozen heads)
    variables,
    batch,  # images, tokens, prompt (box prompts from GT), teacher_embed,
            # teacher_masks (B, NQ?, h, w) -> we use the best-query mask,
            # valid (B, E, E)
    cfg: GeometryFinetuneConfig,
):
    """Returns (total, (parts, mutated))."""

    # student embedding (trunk output) for the embed loss
    embed, mut = model.apply(
        variables,
        batch["images"],
        train=True,
        mutable=["batch_stats"],
        method=lambda m, x, train: m.trunk(x, train=train),
    )
    emb_loss = masked_mse(embed, batch["teacher_embed"], batch["valid"])

    outs, mut2 = model.apply(
        dict(variables, **mut),
        batch["images"],
        batch["tokens"],
        batch["prompt"],
        train=False,  # frozen heads in eval mode (reference stage3/model.py:24)
        mutable=["batch_stats"],
    )
    # best-scoring query's mask against the teacher-path mask
    best = jnp.argmax(outs["pred_logits"][..., 0], axis=1)
    pred_mask = jnp.take_along_axis(
        outs["pred_masks"], best[:, None, None, None], axis=1
    )[:, 0]
    tgt = batch["teacher_mask"]
    if tgt.shape[-2:] != pred_mask.shape[-2:]:
        from efficientsam3_tpu.ops.interpolate import resize_bilinear

        tgt = (resize_bilinear(tgt[:, None], pred_mask.shape[-2:]) > 0.5)[
            :, 0
        ].astype(jnp.float32)
    bce = optax_bce(pred_mask, tgt).mean()
    dl = dice_loss(pred_mask, tgt).mean()
    total = (
        cfg.embed_weight * emb_loss
        + cfg.mask_bce_weight * bce
        + cfg.mask_dice_weight * dl
    )
    return total, ({"embed": emb_loss, "bce": bce, "dice": dl}, mut2)


def geometry_finetune_step(model, tx, cfg, variables, opt_state, batch):
    def loss_fn(params):
        return geometry_finetune_loss(
            model, dict(variables, params=params), batch, cfg
        )

    (loss, (parts, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    return dict(variables, params=params, **mut), opt_state, {"loss": loss, **parts}
