"""End-to-end smoke tests: full image PCS model on tiny shapes (CPU)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_sam3_image_model_tiny():
    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="b0", embed_size=8,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    tokens = jnp.zeros((1, 16), jnp.int32).at[0, 0].set(49406).at[0, 1].set(49407)
    prompt = Prompt.empty(1, 2, 2).with_box(0, 0, jnp.asarray([0.5, 0.5, 0.4, 0.4]))

    variables = model.init(rng, img, tokens, prompt)
    out = jax.jit(lambda v, i, t, p: model.apply(v, i, t, p))(
        variables, img, tokens, prompt
    )
    assert out["pred_logits"].shape == (1, 200, 1)
    assert out["pred_boxes"].shape == (1, 200, 4)
    # masks at 4x the coarsest token grid (8 -> 32)
    assert out["pred_masks"].shape == (1, 200, 32, 32)
    assert out["presence_logit_dec"].shape == (1,)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_stage1_train_step_tiny():
    import optax

    from efficientsam3_tpu.train.stage1 import (
        Stage1ImageConfig, make_student, stage1_train_step,
    )

    cfg = Stage1ImageConfig(
        backbone_type="efficientvit", model_name="b0",
        embed_dim=32, embed_size=4, image_size=32,
    )
    model = make_student(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (2, 32, 32, 3))
    teacher = jax.random.normal(rng, (2, 4, 4, 32))
    valid = jnp.ones((2, 4, 4))
    variables = model.init(rng, imgs, train=True)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(variables["params"])

    import functools

    step = jax.jit(functools.partial(stage1_train_step, model, tx))
    new_vars, new_opt, metrics = step(variables, opt_state, imgs, teacher, valid)
    loss0 = float(metrics["loss"])
    assert np.isfinite(loss0)
    # a second step with the same batch must reduce the loss
    _, _, metrics2 = step(new_vars, new_opt, imgs, teacher, valid)
    assert float(metrics2["loss"]) < loss0
