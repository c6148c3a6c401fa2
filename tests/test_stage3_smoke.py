"""Stage-3 smoke: full-model train step runs, trunks update, heads frozen.

Equivalent of the reference's 2-epoch smoke config sanity
(README_stage3.md:121-132) + the stage3 freeze audit (sanity_check_gpu.py).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def test_stage3_step_freezes_heads_and_reduces_loss():
    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.train.stage3 import (
        Stage3Config,
        make_stage3_optimizer,
        stage3_train_step,
    )
    from efficientsam3_tpu.utils.checkpoint import assert_frozen_unchanged

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="b0", embed_size=8,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=16,
    )
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 64, 64, 3)) * 0.5
    tokens = jnp.zeros((1, 16), jnp.int32).at[0, 0].set(49406).at[0, 1].set(49407)
    prompt = Prompt.empty(1, 2, 2)
    variables = model.init(rng, imgs, tokens, prompt)

    cfg = Stage3Config(vision_lr=1e-3, text_lr=1e-4, warmup_steps=1)
    tx = make_stage3_optimizer(cfg, variables["params"])
    opt_state = tx.init(variables["params"])

    batch = {
        "images": imgs,
        "tokens": tokens,
        "prompt": prompt,
        "rng": jax.random.PRNGKey(1),
        "targets": {
            "boxes": jnp.asarray([[[0.5, 0.5, 0.3, 0.3], [0.2, 0.2, 0.1, 0.1]]]),
            "valid": jnp.asarray([[True, True]]),
        },
    }
    step = jax.jit(functools.partial(stage3_train_step, model, tx))
    v1, o1, m1 = step(variables, opt_state, batch)
    assert np.isfinite(float(m1["loss"]))

    # frozen heads bit-identical; trainable trunks changed
    frozen = [k for k in variables["params"] if k not in ("trunk", "text_encoder")]
    assert_frozen_unchanged(variables["params"], v1["params"], frozen)
    d_trunk = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            variables["params"]["trunk"],
            v1["params"]["trunk"],
        ),
    )
    assert d_trunk > 0

    # a few more steps on the same batch should not diverge
    v, o = v1, o1
    for i in range(2):
        v, o, m = step(v, o, batch)
    assert np.isfinite(float(m["loss"]))
