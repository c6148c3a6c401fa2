"""Parity: cached-bank memory attention == plain condition_features.

The tracker's cached fast path (video/tracker.py encode_memory_kv /
tpos_k_delta / condition_features_cached) projects each memory-bank
entry's k/v once at encode time and applies the slot-age temporal
embedding as an additive rope'd linear delta at attend time. These tests
pin that decomposition to the plain per-frame reprojection path
(reference semantics: sam3/sam3/model/sam3_tracker_base.py:562-794).
"""

import numpy as np

import jax
import jax.numpy as jnp


def _setup(num_heads=1):
    from efficientsam3_tpu.video.tracker import TrackerCore

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    fs = core.feat_size  # 8
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    b, n_mem, n_ptr = 2, 3, 4
    tokens = jax.random.normal(ks[0], (b, fs * fs, 32)) * 0.5
    pos = jax.random.normal(ks[1], (fs * fs, 32)) * 0.2
    mem = jax.random.normal(ks[2], (b, n_mem, fs, fs, 8)) * 0.5
    tpos = jnp.asarray([[0, 1, 2], [2, 0, 1]], jnp.int32)
    valid = jnp.asarray([[True, True, False], [True, True, True]])
    ptrs = jax.random.normal(ks[3], (b, n_ptr, 32)) * 0.5
    tdiff = jnp.asarray([[0.0, 1, 2, 3]] * b)
    pvalid = jnp.asarray([[True, True, False, False], [True] * 4])
    variables = core.init(
        ks[4], tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid,
        method=core.condition_features,
    )
    return core, variables, (tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid)


def _cached_bank(core, variables, mem):
    """Assemble the cached bank entry by entry (as the predictor does)."""
    from efficientsam3_tpu.video.tracker import flatten_kv_bank

    b, n_mem = mem.shape[:2]
    ks, vs = [], []
    for i in range(n_mem):
        k, v = core.apply(variables, mem[:, i], method=core.encode_memory_kv)
        ks.append(k)
        vs.append(v)
    # flat pre-padded bank: k (L, B, S_pad, C); raw v (B, S_pad, mem_dim)
    return flatten_kv_bank(ks, vs)


def test_cached_condition_features_parity():
    core, variables, args = _setup()
    tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid = args

    plain = core.apply(
        variables, tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid,
        method=core.condition_features,
    )
    k_bank, v_bank = _cached_bank(core, variables, mem)
    delta = core.apply(variables, method=core.tpos_k_delta)
    cached = core.apply(
        variables, tokens, pos, k_bank, v_bank, tpos, valid, ptrs, tdiff,
        pvalid, delta,
        method=core.condition_features_cached,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), rtol=0, atol=2e-5
    )


def test_cached_shared_ages_parity():
    """shared_ages=True (the predictor's cached-bank precondition: every
    slot holds the same frame per column) must equal both the per-slot
    cached path and the plain path when tpos rows are identical."""
    core, variables, args = _setup()
    tokens, pos, mem, _, _, ptrs, tdiff, pvalid = args
    b, n_mem = mem.shape[:2]
    tpos = jnp.broadcast_to(jnp.asarray([2, 0, 1], jnp.int32), (b, n_mem))
    valid = jnp.broadcast_to(jnp.asarray([True, True, False]), (b, n_mem))

    plain = core.apply(
        variables, tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid,
        method=core.condition_features,
    )
    k_bank, v_bank = _cached_bank(core, variables, mem)
    delta = core.apply(variables, method=core.tpos_k_delta)
    outs = {}
    for shared in (False, True):
        outs[shared] = core.apply(
            variables, tokens, pos, k_bank, v_bank, tpos, valid, ptrs,
            tdiff, pvalid, delta, shared_ages=shared,
            method=core.condition_features_cached,
        )
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(plain), rtol=0, atol=2e-5
    )


def test_predictor_cached_vs_plain_propagation():
    """End-to-end VOS propagation with the device k/v cache on must equal
    the plain reprojection path frame-for-frame, and the cached program
    must actually have been used."""
    from efficientsam3_tpu.video.predictor import TrackerPredictor
    from efficientsam3_tpu.video.tracker import TrackerCore, init_tracker_variables

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    variables = init_tracker_variables(core, jax.random.PRNGKey(0))
    fs = core.feat_size

    def encode_frame(img):
        key = jax.random.PRNGKey(3)
        s0 = jax.random.normal(key, (1, 4 * fs, 4 * fs, 32)) * 0.1
        s1 = jax.random.normal(key, (1, 2 * fs, 2 * fs, 32)) * 0.1
        top = jax.random.normal(key, (1, fs, fs, 32)) * 0.1 + img.mean() * 0.01
        return {"sam2_fpn": [s0, s1, top]}

    rng = np.random.default_rng(0)
    frames = rng.random((5, 64, 64, 3)).astype(np.float32)

    results = {}
    for cache in (False, True):
        pred = TrackerPredictor(
            core, variables, encode_frame, obj_slots=2, max_point_prompts=4,
            cache_memory_kv=cache,
        )
        calls = {"cached": 0}
        orig = pred._track_cached

        def counting(*a, **kw):
            calls["cached"] += 1
            return orig(*a, **kw)

        pred._track_cached = counting
        state = pred.init_state(frames)
        pred.add_new_points_or_box(state, 0, obj_id=7, points=[[20, 20]],
                                   labels=[1])
        pred.add_new_points_or_box(state, 0, obj_id=9, points=[[40, 44]],
                                   labels=[1])
        results[cache] = [m.copy() for _, _, m in pred.propagate_in_video(state)]
        assert calls["cached"] == (4 if cache else 0)

    for m_plain, m_cached in zip(results[False], results[True]):
        np.testing.assert_allclose(m_cached, m_plain, rtol=0, atol=1e-4)


def test_cached_path_age_update_matches_reprojection():
    """Aging an entry (tpos shift as the window slides) must equal
    reprojecting it with the new temporal embedding — the cache itself
    never changes."""
    core, variables, args = _setup()
    tokens, pos, mem, _, valid, ptrs, tdiff, pvalid = args
    k_bank, v_bank = _cached_bank(core, variables, mem)
    delta = core.apply(variables, method=core.tpos_k_delta)
    for tpos_np in ([[1, 2, 0], [0, 2, 1]], [[2, 2, 2], [0, 0, 0]]):
        tpos = jnp.asarray(tpos_np, jnp.int32)
        plain = core.apply(
            variables, tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid,
            method=core.condition_features,
        )
        cached = core.apply(
            variables, tokens, pos, k_bank, v_bank, tpos, valid, ptrs,
            tdiff, pvalid, delta,
            method=core.condition_features_cached,
        )
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(plain), rtol=0, atol=2e-5
        )


def test_cached_quantized_bank_drift_bounded():
    """quantize_bank=True (opt-in int8 serving mode) must stay within the
    symmetric-int8 noise floor of the exact cached path: only the memory
    keys' logits are quantized, values/softmax/AV stay float."""
    core, variables, args = _setup()
    tokens, pos, mem, tpos, valid, ptrs, tdiff, pvalid = args
    b, n_mem = mem.shape[:2]
    tpos = jnp.broadcast_to(jnp.asarray([2, 0, 1], jnp.int32), (b, n_mem))
    valid = jnp.broadcast_to(jnp.asarray([True, True, True]), (b, n_mem))

    k_bank, v_bank = _cached_bank(core, variables, mem)
    delta = core.apply(variables, method=core.tpos_k_delta)
    outs = {}
    for qz in (False, True):
        outs[qz] = np.asarray(core.apply(
            variables, tokens, pos, k_bank, v_bank, tpos, valid, ptrs,
            tdiff, pvalid, delta, shared_ages=True, quantize_bank=qz,
            method=core.condition_features_cached,
        ))
    scale = np.abs(outs[False]).max()
    rel = np.abs(outs[True] - outs[False]).max() / scale
    assert rel < 2e-2, rel
    # and the exact path itself is untouched by the flag's default
    assert np.array_equal(outs[False], outs[False])


def test_predictor_quantized_bank_propagation_close():
    """VOS propagation with the int8 bank must stay mask-level faithful to
    the exact cached path (serving-mode guarantee at the predictor level)."""
    from efficientsam3_tpu.video.predictor import TrackerPredictor
    from efficientsam3_tpu.video.tracker import (
        TrackerCore,
        init_tracker_variables,
    )

    core = TrackerCore(
        image_size=64, backbone_stride=8, d_model=32, mem_dim=8,
        num_maskmem=3, max_obj_ptrs=4,
    )
    variables = init_tracker_variables(core, jax.random.PRNGKey(0))
    fs = core.feat_size

    def encode_frame(img):
        key = jax.random.PRNGKey(3)
        s0 = jax.random.normal(key, (1, 4 * fs, 4 * fs, 32)) * 0.1
        s1 = jax.random.normal(key, (1, 2 * fs, 2 * fs, 32)) * 0.1
        top = jax.random.normal(key, (1, fs, fs, 32)) * 0.1 + img.mean() * 0.01
        return {"sam2_fpn": [s0, s1, top]}

    rng = np.random.default_rng(0)
    frames = rng.random((4, 64, 64, 3)).astype(np.float32)

    masks = {}
    for qz in (False, True):
        pred = TrackerPredictor(
            core, variables, encode_frame, obj_slots=2, max_point_prompts=4,
            cache_memory_kv=True, quantize_bank=qz,
        )
        state = pred.init_state(frames)
        pred.add_new_points_or_box(state, 0, obj_id=7, points=[[20, 20]],
                                   labels=[1])
        masks[qz] = [m.copy() for _, _, m in pred.propagate_in_video(state)]

    for m_exact, m_q8 in zip(masks[False], masks[True]):
        a, b = m_exact > 0, m_q8 > 0
        inter, union = (a & b).sum(), (a | b).sum()
        iou = 1.0 if union == 0 else inter / union
        assert iou > 0.98, iou
