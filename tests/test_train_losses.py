"""Matcher + detection-loss + stage-3 step tests (tiny shapes, CPU)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_hungarian_match_basic():
    from efficientsam3_tpu.train.matcher import hungarian_match

    # two targets, queries 1 and 3 are obvious matches
    pred_boxes = jnp.asarray(
        [[[0.9, 0.9, 0.1, 0.1], [0.25, 0.25, 0.2, 0.2], [0.1, 0.8, 0.1, 0.1],
          [0.7, 0.7, 0.3, 0.3]]]
    )
    pred_logits = jnp.full((1, 4, 1), 3.0)
    tgt_boxes = jnp.asarray([[[0.25, 0.25, 0.2, 0.2], [0.7, 0.7, 0.3, 0.3],
                              [0.0, 0.0, 0.0, 0.0]]])
    tgt_valid = jnp.asarray([[True, True, False]])
    assigned, valid = jax.jit(hungarian_match)(
        pred_logits, pred_boxes, tgt_boxes, tgt_valid
    )
    a = np.asarray(assigned)[0]
    assert a[0] == 1 and a[1] == 3


def test_detection_loss_gradients():
    from efficientsam3_tpu.train.losses import sam3_detection_loss

    rng = jax.random.PRNGKey(0)
    q, t = 6, 2
    outputs = {
        "pred_logits": jax.random.normal(rng, (1, q, 1)),
        "pred_boxes": jax.nn.sigmoid(jax.random.normal(rng, (1, q, 4))),
        "pred_masks": jax.random.normal(rng, (1, q, 8, 8)),
        "presence_logit_dec": jnp.zeros((1,)),
    }
    targets = {
        "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]]]),
        "valid": jnp.asarray([[True, True]]),
        "masks": (jax.random.uniform(rng, (1, t, 8, 8)) > 0.5).astype(jnp.float32),
    }

    def total(o):
        return sam3_detection_loss(o, targets)[0]

    loss, parts = jax.jit(lambda o: sam3_detection_loss(o, targets))(outputs)
    assert np.isfinite(float(loss))
    assert set(parts) >= {
        "loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice",
        "presence_loss",
    }
    grads = jax.jit(jax.grad(total))(outputs)
    for k in ("pred_logits", "pred_boxes", "pred_masks"):
        assert np.isfinite(np.asarray(grads[k])).all()
        assert np.abs(np.asarray(grads[k])).sum() > 0


def test_stage3_freeze_labels():
    from efficientsam3_tpu.train.stage3 import param_labels

    params = {
        "trunk": {"a": jnp.zeros(2)},
        "text_encoder": {"b": jnp.zeros(2)},
        "decoder": {"c": jnp.zeros(2)},
    }
    labels = param_labels(params)
    assert labels["trunk"]["a"] == "vision"
    assert labels["text_encoder"]["b"] == "text"
    assert labels["decoder"]["c"] == "frozen"
