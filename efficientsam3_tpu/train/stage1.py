"""Stage-1 encoder distillation: student trunk vs saved teacher embeddings.

Mirrors the reference stage-1 image distillation
(stage1/train_image_encoder_stage1.py): the student (trunk + projection
head) regresses the teacher's 72x72x1024 embedding with a masked MSE plus a
masked per-pixel cosine loss (train_image_encoder_stage1.py:284-297), with
AdamW + grad clip 5.0 and a cosine LR schedule scaled linearly by global
batch / 512 (stage1/configs/base_stage1.yaml).

TPU-first: one jitted train step; data parallelism is plain batch sharding
over a ('dp',) mesh — XLA inserts the gradient all-reduce (replacing the
reference's DDP/NCCL). BatchNorm statistics are updated locally per shard
and averaged by the same replication constraint.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from efficientsam3_tpu.build import make_student_trunk


@dataclasses.dataclass(frozen=True)
class Stage1ImageConfig:
    backbone_type: str = "efficientvit"
    model_name: str = "b1"
    embed_dim: int = 1024
    embed_size: int = 72
    image_size: int = 1008
    pixel_loss_weight: float = 1.0  # MSE (base_stage1.yaml PIXEL_WISE)
    cosine_loss_weight: float = 1.0  # COSINE
    base_lr: float = 1e-3
    weight_decay: float = 0.05
    grad_clip: float = 5.0
    epochs: int = 50
    global_batch: int = 64


def make_student(cfg: Stage1ImageConfig):
    return make_student_trunk(
        cfg.backbone_type, cfg.model_name, embed_dim=cfg.embed_dim,
        embed_size=cfg.embed_size,
    )


def masked_mse(pred, target, valid_mask):
    """reference stage1/train_image_encoder_stage1.py:284.

    pred/target: (B, H, W, C); valid_mask: (B, H, W) 1.0 where valid.
    """
    err = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    err = err.mean(axis=-1) * valid_mask
    return err.sum() / jnp.maximum(valid_mask.sum(), 1.0)


def masked_cosine_loss(pred, target, valid_mask):
    """reference stage1/train_image_encoder_stage1.py:291: 1 - cos per pixel."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    dot = (p * t).sum(-1)
    denom = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1) + 1e-6
    cos = dot / denom
    loss = (1.0 - cos) * valid_mask
    return loss.sum() / jnp.maximum(valid_mask.sum(), 1.0)


def stage1_loss(model, variables, images, teacher_embed, valid_mask, cfg=None):
    pix_w = cfg.pixel_loss_weight if cfg else 1.0
    cos_w = cfg.cosine_loss_weight if cfg else 1.0
    pred, mutated = model.apply(
        variables, images, train=True, mutable=["batch_stats"]
    )
    mse = masked_mse(pred, teacher_embed, valid_mask)
    cos = masked_cosine_loss(pred, teacher_embed, valid_mask)
    return pix_w * mse + cos_w * cos, (mse, cos, mutated)


def stage1_train_step(model, tx, variables, opt_state, images, teacher_embed, valid_mask):
    """One distillation step. Returns (variables, opt_state, metrics)."""

    def loss_fn(params):
        vars_in = dict(variables, params=params)
        return stage1_loss(model, vars_in, images, teacher_embed, valid_mask)

    (loss, (mse, cos, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)
    new_vars = dict(variables, params=new_params, **mutated)
    metrics = {"loss": loss, "mse": mse, "cosine": cos}
    return new_vars, opt_state, metrics


def make_optimizer(cfg: Stage1ImageConfig, steps_per_epoch: int):
    """AdamW + cosine schedule + clip, linear LR scaling by batch/512."""
    lr = cfg.base_lr * cfg.global_batch / 512.0
    schedule = optax.cosine_decay_schedule(
        lr, decay_steps=cfg.epochs * steps_per_epoch, alpha=1e-2
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
