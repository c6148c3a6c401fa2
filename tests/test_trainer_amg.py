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


class FakeBatchPredictor:
    """predict_batch-contract fake (sam1_task.InteractiveImagePredictor):
    'detects' the bright square in the current crop iff its extent in
    model pixels is >= min_model_px — mimicking how small objects only
    resolve once a tighter crop magnifies them."""

    input_size = 64
    low_res = 32

    def __init__(self, min_model_px=8):
        self.min_model_px = min_model_px

    def set_image(self, image):
        self.crop = np.asarray(image)
        self.ch, self.cw = image.shape[:2]
        bright = image[..., 0] > 200
        ys, xs = np.nonzero(bright)
        self.obj = (
            (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
            if xs.size
            else None
        )

    def predict_batch(self, coords, stability_offset=1.0):
        r, hl = self.input_size, self.low_res
        P = len(coords)
        low = np.full((P * 3, hl, hl), -8.0, np.float32)
        iou = np.full((P * 3,), 0.05, np.float32)
        detectable = (
            self.obj is not None
            and (self.obj[2] - self.obj[0]) * r / self.cw >= self.min_model_px
        )
        if detectable:
            x0, y0, x1, y1 = self.obj
            lx0, ly0 = int(x0 * hl / self.cw), int(y0 * hl / self.ch)
            lx1, ly1 = (
                max(int(x1 * hl / self.cw), lx0 + 1),
                max(int(y1 * hl / self.ch), ly0 + 1),
            )
            for p in range(P):
                cx, cy = coords[p][0] * self.cw / r, coords[p][1] * self.ch / r
                if x0 <= cx < x1 and y0 <= cy < y1:
                    low[p * 3 : p * 3 + 3, ly0:ly1, lx0:lx1] = 8.0
                    iou[p * 3 : p * 3 + 3] = [0.95, 0.93, 0.9]
        stab = (
            (low > stability_offset).reshape(P * 3, -1).sum(-1)
            / np.maximum((low > -stability_offset).reshape(P * 3, -1).sum(-1), 1)
        ).astype(np.float32)
        fg = low > 0
        boxes = np.zeros((P * 3, 4), np.float32)
        empty = ~fg.any((-1, -2))
        for i in range(P * 3):
            ys, xs = np.nonzero(fg[i])
            if xs.size:
                boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return jnp.asarray(low), iou, stab, boxes, empty


def test_automatic_mask_generator_grid_and_records():
    from efficientsam3_tpu.automatic_mask_generator import (
        AutomaticMaskGenerator,
        build_point_grid,
    )

    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert 0 < grid.min() and grid.max() < 1

    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255  # big object: visible without crops
    gen = AutomaticMaskGenerator(
        FakeBatchPredictor(), points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.9, stability_score_thresh=0.5, nms_iou_thresh=0.5,
    )
    recs = gen.generate(img)
    assert len(recs) >= 1
    for r in recs:
        assert {
            "segmentation", "area", "bbox", "predicted_iou",
            "stability_score", "point_coords", "crop_box",
        } <= set(r)
        assert r["area"] > 0
    # mask localizes the object in full-image coords
    from efficientsam3_tpu.eval.coco_format import ann_to_mask

    m = ann_to_mask(recs[0], 64, 64)
    inter = (m & (img[..., 0] > 200)).sum()
    assert inter / m.sum() > 0.5


def test_amg_crop_pyramid_finds_small_object():
    """A small object resolves only under the crop pyramid: invisible to
    the full-image pass, found with crop_n_layers=2 (reference
    automatic_mask_generator.py crop_n_layers semantics)."""
    from efficientsam3_tpu.automatic_mask_generator import (
        AutomaticMaskGenerator,
    )

    img = np.zeros((384, 384, 3), np.uint8)
    img[198:222, 198:222] = 255  # 24 px object in a 384 px image

    def make(crop_n_layers):
        return AutomaticMaskGenerator(
            FakeBatchPredictor(min_model_px=8),
            points_per_side=16, points_per_batch=64,
            pred_iou_thresh=0.9, stability_score_thresh=0.5,
            nms_iou_thresh=0.5, crop_n_layers=crop_n_layers,
        )

    assert make(0).generate(img) == []
    recs = make(2).generate(img)
    assert len(recs) >= 1
    x, y, w, h = recs[0]["bbox"]
    # found box overlaps the object in full-image coordinates
    assert x < 222 and x + w > 198 and y < 222 and y + h > 198
    assert recs[0]["crop_box"][2] - recs[0]["crop_box"][0] < 384


def test_amg_crop_box_generation():
    from efficientsam3_tpu.automatic_mask_generator import generate_crop_boxes

    boxes, layers = generate_crop_boxes((300, 400), 2, 512 / 1500)
    assert boxes[0] == [0, 0, 400, 300] and layers[0] == 0
    assert layers.count(1) == 4 and layers.count(2) == 16
    for b in boxes:
        assert 0 <= b[0] < b[2] <= 400 and 0 <= b[1] < b[3] <= 300
    # layer-1 neighbours overlap
    l1 = [b for b, l in zip(boxes, layers) if l == 1]
    assert l1[0][2] > l1[1][0]


def test_amg_small_region_postprocess():
    from efficientsam3_tpu.automatic_mask_generator import (
        _remove_small_regions,
    )

    m = np.zeros((32, 32), bool)
    m[4:28, 4:28] = True
    m[10:12, 10:12] = False  # small hole
    m[30:32, 30:32] = True  # small island
    out, changed = _remove_small_regions(m, 16, "holes")
    assert changed and out[10, 10]
    out2, changed2 = _remove_small_regions(out, 16, "islands")
    assert changed2 and not out2[30, 30]
    assert out2[5, 5]


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


def test_predict_batch_matches_single_predict():
    """predict_batch (the AMG hot path) agrees with per-point predict on a
    tiny real TrackerCore: same low-res logits and IoUs."""
    from efficientsam3_tpu.sam1_task import InteractiveImagePredictor
    from efficientsam3_tpu.video.tracker import TrackerCore

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    fs = core.feat_size
    rng = jax.random.PRNGKey(0)
    s0 = jax.random.normal(rng, (1, 4 * fs, 4 * fs, 4)) * 0.1
    s1 = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2 * fs, 2 * fs, 8)) * 0.1
    tokens = jax.random.normal(jax.random.fold_in(rng, 2), (1, fs * fs, 32)) * 0.1
    variables = core.init(
        rng,
        jax.random.normal(rng, (1, fs, fs, 32)),
        jnp.zeros((1, 2, 2)), -jnp.ones((1, 2), jnp.int32), (s0, s1), True,
        method=core.forward_sam_heads,
    )
    v2 = core.init(rng, tokens, method=core.no_mem_features)
    variables = {"params": {**v2["params"], **variables["params"]}}

    pred = InteractiveImagePredictor(core, variables, encode_frame=None)
    pred._state = {"tokens": tokens, "s0": s0, "s1": s1, "orig_hw": (64, 64)}

    pts = np.array([[10.0, 12.0], [40.0, 50.0], [32.0, 32.0]], np.float32)
    low_b, iou_b, stab_b, boxes_b, empty_b = pred.predict_batch(pts)
    low_b = np.asarray(low_b)
    assert low_b.shape[0] == 9 and iou_b.shape == (9,)

    for p in range(3):
        _, ious, low = pred.predict(
            point_coords=pts[p : p + 1] , point_labels=np.asarray([1]),
            multimask_output=True,
        )
        np.testing.assert_allclose(
            low_b[p * 3 : p * 3 + 3], np.asarray(low), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(iou_b)[p * 3 : p * 3 + 3], ious, atol=2e-5
        )
