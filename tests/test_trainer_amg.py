"""Trainer loop (resume + partial checkpoints) and automatic mask generator."""

import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax


def test_trainer_loop_resume_and_partial_ckpt(tmp_path):
    from efficientsam3_tpu.train.trainer import Trainer, TrainerConfig

    # toy quadratic problem: params {'trunk': w, 'decoder': frozen}
    variables = {
        "params": {"trunk": {"w": jnp.ones(4) * 5.0}, "decoder": {"w": jnp.zeros(2)}}
    }
    tx = optax.sgd(0.1)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state, batch):
        def loss_fn(params):
            return jnp.sum((params["trunk"]["w"] - batch["target"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, new_opt = tx.update(grads, opt_state)
        params = optax.apply_updates(variables["params"], updates)
        return dict(variables, params=params), new_opt, {"loss": loss}

    cfg = TrainerConfig(
        max_steps=10, log_every=5, checkpoint_every=5,
        checkpoint_dir=str(tmp_path), save_param_prefixes=("trunk",),
    )
    trainer = Trainer(step, cfg)
    batches = ({"target": jnp.zeros(4)} for _ in range(100))
    v1, o1, s1 = trainer.run(variables, opt_state, batches)
    assert s1 == 10
    assert float(jnp.abs(v1["params"]["trunk"]["w"]).sum()) < 5.0

    # partial checkpoint saved only the trunk
    from efficientsam3_tpu.utils.checkpoint import latest_step, load_checkpoint

    assert latest_step(str(tmp_path)) == 10
    state, _ = load_checkpoint(str(tmp_path), 10)
    assert "trunk" in state["variables"]["params"]
    assert "decoder" not in state["variables"]["params"]


def test_automatic_mask_generator_grid_and_records():
    from efficientsam3_tpu.automatic_mask_generator import (
        AutomaticMaskGenerator,
        build_point_grid,
    )

    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert 0 < grid.min() and grid.max() < 1

    class FakePredictor:
        """Returns a disk mask around the prompt point."""

        def set_image(self, image):
            self.hw = image.shape[:2]

        def predict(self, point_coords, point_labels, multimask_output=True):
            h, w = self.hw
            yy, xx = np.mgrid[:h, :w]
            cx, cy = point_coords[0]
            m = (xx - cx) ** 2 + (yy - cy) ** 2 < 36
            masks = np.stack([m, m, m])
            logits = np.where(masks, 8.0, -8.0)[:, ::2, ::2]
            return masks, np.asarray([0.95, 0.9, 0.89]), logits

    gen = AutomaticMaskGenerator(
        FakePredictor(), points_per_side=4, pred_iou_thresh=0.9,
        stability_score_thresh=0.5, nms_iou_thresh=0.5,
    )
    img = np.zeros((64, 64, 3), np.uint8)
    recs = gen.generate(img)
    assert len(recs) >= 4  # grid points far apart survive NMS
    for r in recs:
        assert {"segmentation", "area", "bbox", "predicted_iou"} <= set(r)
        assert r["area"] > 0


def test_trainer_preemption_checkpoint(tmp_path):
    """SIGTERM-style preemption: the loop stops after the in-flight step and
    the final checkpoint lands, so a requeued run resumes from there
    (reference SubmititRunner checkpoint/requeue)."""
    from efficientsam3_tpu.train.trainer import Trainer, TrainerConfig
    from efficientsam3_tpu.utils.checkpoint import latest_step

    variables = {"params": {"w": jnp.ones(2)}}
    tx = optax.sgd(0.1)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state, batch):
        grads = jax.tree.map(jnp.ones_like, variables["params"])
        updates, new_opt = tx.update(grads, opt_state)
        params = optax.apply_updates(variables["params"], updates)
        return dict(variables, params=params), new_opt, {"loss": jnp.zeros(())}

    cfg = TrainerConfig(
        max_steps=100, log_every=100, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path),
    )
    trainer = Trainer(step, cfg)

    def batches():
        for i in range(100):
            if i == 3:
                trainer.preempted = True  # what the signal handler sets
            yield {}

    _, _, s = trainer.run(variables, opt_state, batches())
    assert s == 3
    assert latest_step(str(tmp_path)) == 3


def test_trainer_gradient_accumulation():
    """optax.MultiSteps composes with the driver: k micro-steps produce one
    optimizer update equal to the mean-gradient update (reference trainer
    grad-accum semantics, trainer.py:145)."""
    from efficientsam3_tpu.train.trainer import Trainer, TrainerConfig

    k = 4
    lr = 0.5
    tx = optax.MultiSteps(optax.sgd(lr), every_k_schedule=k)
    variables = {"params": {"w": jnp.zeros(())}}
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(variables, opt_state, batch):
        def loss_fn(params):
            return params["w"] * batch["g"]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, new_opt = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return dict(variables, params=params), new_opt, {"loss": loss}

    trainer = Trainer(step, TrainerConfig(max_steps=2 * k, log_every=1000))
    gs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    batches = ({"g": jnp.asarray(g)} for g in gs)
    v, _, s = trainer.run(variables, opt_state, batches)
    assert s == 2 * k
    # two real updates, each -lr * mean(micro grads)
    expect = -lr * (np.mean(gs[:4]) + np.mean(gs[4:]))
    np.testing.assert_allclose(float(v["params"]["w"]), expect, rtol=1e-6)
