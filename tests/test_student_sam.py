"""Standalone SAM1 student models (EdgeSAM lineage, reference
student_sam/build_sam.py): registry, forward shapes, predictor facade."""

import numpy as np

import jax
import jax.numpy as jnp


def test_sam_student_model_forward():
    from efficientsam3_tpu.student_sam import SamStudentModel, _make_trunk

    model = SamStudentModel(
        trunk=_make_trunk("efficientvit", "b0"), image_size=128, embed_size=16
    )
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 128, 128, 3)) * 0.3
    pts = jnp.asarray([[[40.0, 50.0], [0.0, 0.0]]])
    labs = jnp.asarray([[1, -1]], jnp.int32)
    variables = model.init(rng, img, pts, labs, True)
    low, ious = model.apply(variables, img, pts, labs, True)
    assert low.shape == (1, 3, 64, 64)  # 3 multimask at 4x embed
    assert ious.shape == (1, 3)
    low1, ious1 = model.apply(variables, img, pts, labs, False)
    assert low1.shape == (1, 1, 64, 64)


def test_registry_and_predictor():
    from efficientsam3_tpu.student_sam import (
        SamStudentPredictor,
        sam_model_registry,
    )

    assert {"edge_sam", "vit_b", "vit_h", "repvit", "tinyvit",
            "efficientvit"} <= set(sam_model_registry)
    model = sam_model_registry["efficientvit"]()
    # tiny instance for the predictor test
    from efficientsam3_tpu.student_sam import SamStudentModel, _make_trunk

    model = SamStudentModel(
        trunk=_make_trunk("efficientvit", "b0"), image_size=128, embed_size=16
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 2, 2)), -jnp.ones((1, 2), jnp.int32), True,
    )
    pred = SamStudentPredictor(model, variables)
    img = (np.random.default_rng(0).random((96, 160, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, ious, low = pred.predict(
        point_coords=np.array([[80.0, 50.0]]), point_labels=[1]
    )
    assert masks.shape == (3, 96, 160) and masks.dtype == bool
    m2, i2, _ = pred.predict(box=np.array([10.0, 10.0, 120.0, 80.0]),
                             multimask_output=False)
    assert m2.shape == (1, 96, 160)
