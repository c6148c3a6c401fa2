"""Train-time interactive-steps loop: click sampling correctness + the
unrolled multi-step grounding loss runs jitted with finite gradients."""

import numpy as np

import jax
import jax.numpy as jnp


def test_sample_correction_click_targets_error_region():
    from efficientsam3_tpu.train.interactive import sample_correction_click

    h = w = 32
    prev = np.full((2, 3, h, w), -5.0, np.float32)
    # sample 0: predict nothing; GT square -> FN click inside GT (label 1)
    gt = np.zeros((2, 2, h, w), np.float32)
    gt[0, 0, 8:16, 8:16] = 1.0
    # sample 1: predict a square where GT is empty -> FP click (label 0)
    prev[1, 0, 20:28, 4:12] = 5.0
    valid = np.array([[True, False], [False, False]])
    logits = np.zeros((2, 3, 1), np.float32)
    logits[1, 0, 0] = 3.0  # best query = the one predicting the square

    xy, labels, has = jax.jit(sample_correction_click)(
        jnp.asarray(prev), jnp.asarray(logits), jnp.asarray(gt),
        jnp.asarray(valid),
    )
    xy, labels, has = np.asarray(xy), np.asarray(labels), np.asarray(has)
    assert has.all()
    # FN click lands inside the GT square with label 1
    x0, y0 = xy[0] * [w, h]
    assert 8 <= x0 < 16 and 8 <= y0 < 16 and labels[0] == 1
    # FP click lands inside the wrong prediction with label 0
    x1, y1 = xy[1] * [w, h]
    assert 4 <= x1 < 12 and 20 <= y1 < 28 and labels[1] == 0


def test_interactive_grounding_loss_runs_and_grads():
    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.train.interactive import interactive_grounding_loss

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="b0", embed_size=8,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=16,
    )
    rng = jax.random.PRNGKey(0)
    # all-zero images degenerate BatchNorm/linear-attention denominators
    # (0/0 -> NaN grads); real inputs are never constant
    images = jax.random.normal(rng, (1, 112, 112, 3)) * 0.5
    tokens = jnp.zeros((1, 16), jnp.int32)
    prompt = Prompt.empty(1, 2, 4)
    variables = model.init(rng, images, tokens, prompt)

    t = 2
    targets = {
        "boxes": jnp.asarray([[[0.5, 0.5, 0.25, 0.25], [0.2, 0.3, 0.1, 0.1]]]),
        "valid": jnp.asarray([[True, True]]),
        "masks": (jax.random.uniform(rng, (1, t, 32, 32)) > 0.7).astype(
            jnp.float32
        ),
    }

    def loss_fn(params):
        total, (parts, _) = interactive_grounding_loss(
            model, dict(variables, params=params), images, tokens, prompt,
            targets, num_interactive_steps=1, rng=rng,
        )
        return total, parts

    (loss, parts), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert len(parts) == 2  # loss computed on BOTH interactive steps
    leaf_sums = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert np.isfinite(leaf_sums).all()
    assert sum(leaf_sums) > 0
