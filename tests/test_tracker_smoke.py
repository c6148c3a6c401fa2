"""Tracker + VOS predictor smoke test on tiny shapes (CPU)."""

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_setup():
    from efficientsam3_tpu.video.tracker import TrackerCore

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    fs = core.feat_size  # 8
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.normal(rng, (2, fs * fs, 32)) * 0.1
    s0 = jax.random.normal(rng, (2, 4 * fs, 4 * fs, 4)) * 0.1
    s1 = jax.random.normal(rng, (2, 2 * fs, 2 * fs, 8)) * 0.1
    coords = jnp.zeros((2, 3, 2))
    labels = -jnp.ones((2, 3), jnp.int32)
    variables = core.init(
        rng,
        jax.random.normal(rng, (2, fs, fs, 32)),
        coords, labels, (s0, s1), True,
        method=core.forward_sam_heads,
    )
    # init the remaining submodules (memory attention/encoder params)
    mem = jnp.zeros((2, 3, fs, fs, 8))
    v2 = core.init(
        rng, tokens, jnp.zeros((fs * fs, 32)), mem,
        jnp.zeros((2, 3), jnp.int32), jnp.ones((2, 3), bool),
        jnp.zeros((2, 4, 32)), jnp.zeros((2, 4)), jnp.ones((2, 4), bool),
        method=core.condition_features,
    )
    v3 = core.init(
        rng, tokens, jnp.zeros((2, 1, 64, 64)), jnp.zeros((2, 1)), False,
        method=core.encode_memory,
    )
    v4 = core.init(
        rng, jnp.zeros((2, 4 * fs, 4 * fs, 32)), jnp.zeros((2, 2 * fs, 2 * fs, 32)),
        method=lambda m, a, b: m.sam_mask_decoder.high_res_convs(a, b),
    )
    pix0 = jnp.zeros((2, fs, fs, 32))
    v5 = core.init(
        rng, pix0, (s0, s1), jnp.zeros((2, 64, 64, 1)),
        method=core.use_mask_as_output,
    )
    params = _merge(
        v2["params"], v3["params"], variables["params"], v4["params"], v5["params"]
    )
    return core, {"params": params}, tokens, s0, s1


def _merge(*trees):
    out = {}
    for t in trees:
        for k, v in t.items():
            if k in out and isinstance(out[k], dict):
                out[k] = _merge(out[k], v)
            else:
                out[k] = v
    return out


def test_tracker_core_roundtrip():
    core, variables, tokens, s0, s1 = _tiny_setup()
    fs = core.feat_size
    # cond path: no-mem features + SAM heads
    cond = core.apply(variables, tokens, method=core.no_mem_features)
    pix = cond.reshape(2, fs, fs, 32)
    coords = jnp.asarray([[[10.0, 12.0], [0, 0], [0, 0]]] * 2)
    labels = jnp.asarray([[1, -1, -1]] * 2, jnp.int32)
    heads = core.apply(
        variables, pix, coords, labels, (s0, s1), True,
        method=core.forward_sam_heads,
    )
    assert heads["low_res_masks"].shape == (2, 1, 4 * fs, 4 * fs)
    assert heads["high_res_masks"].shape == (2, 1, 64, 64)
    assert heads["obj_ptr"].shape == (2, 32)

    # memory encoding
    mem = core.apply(
        variables, tokens, heads["high_res_masks"],
        heads["object_score_logits"], True, method=core.encode_memory,
    )
    assert mem.shape == (2, fs, fs, 8)

    # memory-conditioned step
    mem_bank = jnp.stack([mem, mem, jnp.zeros_like(mem)], axis=1)
    tpos = jnp.asarray([[0, 1, 2]] * 2, jnp.int32)
    valid = jnp.asarray([[True, True, False]] * 2)
    ptrs = jnp.stack([heads["obj_ptr"]] * 4, axis=1)
    tdiff = jnp.asarray([[0.0, 1, 2, 3]] * 2)
    pvalid = jnp.asarray([[True, True, False, False]] * 2)
    pos = jnp.zeros((fs * fs, 32))
    cond2 = core.apply(
        variables, tokens, pos, mem_bank, tpos, valid, ptrs, tdiff, pvalid,
        method=core.condition_features,
    )
    assert cond2.shape == tokens.shape
    assert np.isfinite(np.asarray(cond2)).all()


def test_vos_predictor_three_frames():
    from efficientsam3_tpu.video.predictor import TrackerPredictor
    from efficientsam3_tpu.video.tracker import TrackerCore

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    _, variables, *_ = _tiny_setup()
    fs = core.feat_size
    rng = np.random.default_rng(0)

    def encode_frame(img):
        # stand-in backbone: fixed random projection of the image (raw
        # d_model-channel levels; the predictor applies conv_s0/conv_s1)
        key = jax.random.PRNGKey(3)
        s0 = jax.random.normal(key, (1, 4 * fs, 4 * fs, 32)) * 0.1
        s1 = jax.random.normal(key, (1, 2 * fs, 2 * fs, 32)) * 0.1
        top = jax.random.normal(key, (1, fs, fs, 32)) * 0.1 + img.mean() * 0.01
        return {"sam2_fpn": [s0, s1, top]}

    pred = TrackerPredictor(core, variables, encode_frame, obj_slots=2,
                            max_point_prompts=4)
    frames = rng.random((3, 64, 64, 3)).astype(np.float32)
    state = pred.init_state(frames)
    _, obj_ids, masks = pred.add_new_points_or_box(
        state, 0, obj_id=7, points=[[20, 20]], labels=[1]
    )
    assert obj_ids == [7]
    assert masks.shape == (1, 1, 4 * fs, 4 * fs)
    outs = list(pred.propagate_in_video(state))
    assert [t for t, _, _ in outs] == [0, 1, 2]
    for _, ids, m in outs:
        assert ids == [7]
        assert np.isfinite(m).all()


def test_init_tracker_variables_covers_all_methods():
    import jax

    from efficientsam3_tpu.video.tracker import TrackerCore, init_tracker_variables

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    variables = init_tracker_variables(core, jax.random.PRNGKey(0))
    params = variables["params"]
    for sub in ("memory_attention", "memory_encoder", "sam_prompt_encoder",
                "sam_mask_decoder", "obj_ptr_proj"):
        assert sub in params, f"missing {sub}: {sorted(params)}"
    # and it actually drives the heads (no lazy-init holes)
    core2, tiny_vars, tokens, s0, s1 = _tiny_setup()
    fs = core.feat_size
    import jax.numpy as jnp

    cond = core.apply(variables, tokens[:1, :, :32] * 0 + 0.1,
                      method=core.no_mem_features)
    out = core.apply(
        variables, cond.reshape(1, fs, fs, 32), jnp.zeros((1, 2, 2)),
        -jnp.ones((1, 2), jnp.int32),
        (jnp.zeros((1, 4 * fs, 4 * fs, 4)), jnp.zeros((1, 2 * fs, 2 * fs, 8))),
        True, method=core.forward_sam_heads,
    )
    assert all(jnp.isfinite(x).all() for x in jax.tree.leaves(out))


def test_empty_slots_do_not_affect_valid_slots():
    """Slot-skip masking: an object slot with no valid memories/pointers is
    self-attention-masked (the flash kernel skips its blocks on TPU); the
    VALID slots' conditioned features must be bit-identical to a run where
    the empty slot carries garbage-but-"valid" structure."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    core, variables, *_ = _tiny_setup()
    fs, d, md = core.feat_size, core.d_model, core.mem_dim
    b = 3
    rng = np.random.RandomState(0)
    tok = jnp.asarray(rng.rand(b, fs * fs, d), jnp.float32)
    pos = jnp.asarray(rng.rand(fs * fs, d), jnp.float32)
    mem = jnp.asarray(rng.rand(b, core.num_maskmem, fs, fs, md), jnp.float32)
    tpos = jnp.zeros((b, core.num_maskmem), jnp.int32)
    ptrs = jnp.asarray(rng.rand(b, core.max_obj_ptrs, d), jnp.float32)
    tdiff = jnp.ones((b, core.max_obj_ptrs), jnp.float32)

    def run(mvalid, pvalid):
        return core.apply(
            variables, tok, pos, mem, tpos, jnp.asarray(mvalid),
            ptrs, tdiff, jnp.asarray(pvalid),
            method=core.condition_features,
        )

    all_valid = np.ones((b, core.num_maskmem), bool)
    all_pvalid = np.ones((b, core.max_obj_ptrs), bool)
    dense = run(all_valid, all_pvalid)

    # slot 1 empty: no memories, no pointers
    mv = all_valid.copy(); mv[1] = False
    pv = all_pvalid.copy(); pv[1] = False
    sparse = run(mv, pv)

    # valid slots identical; empty slot finite (predictor gates it anyway)
    np.testing.assert_array_equal(np.asarray(sparse[0]), np.asarray(
        run(mv, pv)[0]))  # determinism sanity
    np.testing.assert_allclose(
        np.asarray(sparse[0]), np.asarray(dense[0]), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sparse[2]), np.asarray(dense[2]), atol=2e-5, rtol=2e-5
    )
    assert np.isfinite(np.asarray(sparse[1])).all()
