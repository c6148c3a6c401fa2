"""Stage-3 joint finetune: train the student trunks inside the full model.

Mirrors the reference stage-3 recipe (stage3/model.py:24-34 freeze-all-then-
unfreeze-trunks; README_stage3.md:190-203: vision lr 2.5e-5, text lr 5e-6,
wd 0.1, inverse-sqrt schedule, bf16) using the detection losses in
train/losses.py on the full Sam3ImageModel forward (DAC on).

TPU-first: freezing is an optax.multi_transform over param-path labels
(frozen subtrees get set_to_zero, exactly matching the reference's
`skip_saving_parameters` + requires_grad_(False) pattern); data parallelism
is batch sharding over a ('dp',) mesh with replicated params.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from efficientsam3_tpu.train.losses import sam3_detection_loss


@dataclasses.dataclass(frozen=True)
class Stage3Config:
    vision_lr: float = 2.5e-5
    text_lr: float = 5e-6
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    warmup_steps: int = 1000
    timescale: int = 10000
    # Reference stage 3 freezes everything except the student trunks
    # (stage3/model.py:24-34) because the heads come pretrained. From-scratch
    # runs (the overfit-to-quality proof, scripts/train_overfit_quality.py)
    # have no pretrained heads to freeze — train_all=True puts the heads in
    # the 'vision' group instead.
    train_all: bool = False
    # 'inverse_sqrt' (reference stage-3 recipe) or 'cosine' (decay to ~0 at
    # `timescale` steps — what an overfit-to-convergence run needs; the
    # inverse-sqrt schedule is CONSTANT while step < timescale, so short
    # runs never see decay and box refinement stalls at an lr-noise floor).
    schedule: str = "inverse_sqrt"


def param_labels(params, train_all: bool = False):
    """Label each param: 'vision' (student trunk), 'text' (text tower),
    'frozen' (everything else — the frozen SAM3 heads; 'vision' instead
    when train_all)."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        top = path[0]
        if top == "trunk":
            labels[path] = "vision"
        elif top == "text_encoder":
            labels[path] = "text"
        else:
            labels[path] = "vision" if train_all else "frozen"
    return traverse_util.unflatten_dict(labels)


def inverse_sqrt_schedule(base_lr: float, warmup: int, timescale: int):
    def fn(step):
        step = jnp.maximum(step, 1)
        warm = jnp.minimum(step / jnp.maximum(warmup, 1), 1.0)
        return base_lr * warm * jnp.sqrt(timescale / jnp.maximum(step, timescale))

    return fn


def cosine_schedule(base_lr: float, warmup: int, total: int):
    def fn(step):
        warm = jnp.minimum(step / jnp.maximum(warmup, 1), 1.0)
        frac = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
        return base_lr * warm * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return fn


def make_stage3_optimizer(cfg: Stage3Config, params):
    labels = param_labels(params, cfg.train_all)
    sched = cosine_schedule if cfg.schedule == "cosine" else inverse_sqrt_schedule

    def group(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(
                sched(lr, cfg.warmup_steps, cfg.timescale),
                weight_decay=cfg.weight_decay,
            ),
        )

    return optax.multi_transform(
        {
            "vision": group(cfg.vision_lr),
            "text": group(cfg.text_lr),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )


def stage3_train_step(model, tx, variables, opt_state, batch,
                      loss_weights=None):
    """batch: images (B, H, W, 3), tokens (B, L), prompt (Prompt),
    targets dict (boxes/valid/masks). loss_weights: optional static
    overrides merged over losses.DEFAULT_WEIGHTS (e.g. a higher
    presence_loss for overfit-to-quality runs)."""

    def loss_fn(params):
        vars_in = dict(variables, params=params)
        outs, mutated = model.apply(
            vars_in,
            batch["images"],
            batch["tokens"],
            batch["prompt"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": batch["rng"]},
        )
        total, parts = sam3_detection_loss(
            outs, batch["targets"], weights=loss_weights
        )
        return total, (parts, mutated)

    (loss, (parts, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)
    new_vars = dict(variables, params=new_params, **mutated)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        **{f"loss_{k}": v for k, v in parts.items()},
    }
    return new_vars, opt_state, metrics
