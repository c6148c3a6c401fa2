"""Stage-1 text distillation: MobileCLIP student vs teacher token features.

Mirrors reference stage1/train_text_encoder_stage1.py: token-level masked
MSE + cosine on the resized (256-d) token features, plus the
permutation-consistency loss (:244-270, permute_words :327) that encourages
the student to order-sensitivity matching the teacher: features of a
word-permuted prompt must differ from the original's the same way the
teacher's do. Teacher features are precomputed and stored (RecordStore).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class Stage1TextConfig:
    backbone_type: str = "MobileCLIP-S0"
    context_length: int = 32
    output_dim: int = 256
    mse_weight: float = 1.0
    cosine_weight: float = 1.0
    permutation_weight: float = 1.0
    base_lr: float = 1e-3
    weight_decay: float = 0.05
    grad_clip: float = 5.0


def make_text_student(cfg: Stage1TextConfig):
    from efficientsam3_tpu.models.mobile_clip import TextStudentEncoder

    return TextStudentEncoder(
        backbone_type=cfg.backbone_type,
        context_length=cfg.context_length,
        output_dim=cfg.output_dim,
    )


def masked_token_mse(pred, target, valid):
    """pred/target (B, L, C); valid (B, L) 1.0 on real tokens."""
    err = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)).mean(-1)
    return (err * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def masked_token_cosine(pred, target, valid):
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    cos = (p * t).sum(-1) / (
        jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1) + 1e-6
    )
    return ((1.0 - cos) * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def permutation_consistency(pred, pred_perm, tgt, tgt_perm, valid):
    """The student's (original - permuted) feature delta should match the
    teacher's (stage1/train_text_encoder_stage1.py:244-270)."""
    dp = (pred - pred_perm).astype(jnp.float32)
    dt = (tgt - tgt_perm).astype(jnp.float32)
    err = jnp.square(dp - dt).mean(-1)
    return (err * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def stage1_text_loss(model, variables, batch, cfg: Stage1TextConfig):
    """batch: tokens (B, L), tokens_perm (B, L), teacher (B, L, C),
    teacher_perm (B, L, C)."""
    pred, mut = model.apply(
        variables, batch["tokens"], train=True, mutable=["batch_stats"]
    )
    pred, _mask = pred
    pred_perm, mut = model.apply(
        dict(variables, **mut), batch["tokens_perm"], train=True,
        mutable=["batch_stats"],
    )
    pred_perm, _ = pred_perm
    valid = (batch["tokens"] != 0).astype(jnp.float32)
    mse = masked_token_mse(pred, batch["teacher"], valid)
    cos = masked_token_cosine(pred, batch["teacher"], valid)
    perm = permutation_consistency(
        pred, pred_perm, batch["teacher"], batch["teacher_perm"], valid
    )
    total = cfg.mse_weight * mse + cfg.cosine_weight * cos + cfg.permutation_weight * perm
    return total, ({"mse": mse, "cosine": cos, "perm": perm}, mut)


def stage1_text_train_step(model, tx, cfg, variables, opt_state, batch):
    def loss_fn(params):
        return stage1_text_loss(model, dict(variables, params=params), batch, cfg)

    (loss, (parts, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    return dict(variables, params=params, **mut), opt_state, {"loss": loss, **parts}


def permute_words(text: str, rng) -> str:
    """Host-side word permutation (stage1/train_text_encoder_stage1.py:327)."""
    words = text.split()
    if len(words) < 2:
        return text
    idx = rng.permutation(len(words))
    return " ".join(words[i] for i in idx)
