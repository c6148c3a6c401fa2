"""Micro-benchmark harness for kernel iterations on the real chip.

Reuses bench.py's forced-execution two-point methodology (the axon tunnel
returns before execution; naive timing measures the tunnel). Run ad hoc:

    python scripts/bench_micro.py fusion     # fusion-shape attention variants
    python scripts/bench_micro.py tracker    # tracker stage breakdown
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import two_point_step_time


def bench_fn(name, fn, args, n=32):
    sec = two_point_step_time(jax, jnp, fn, n, args)
    print(f"{name:48s} {sec * 1e3:8.3f} ms")
    return sec


def fusion_attention():
    """Attention-only comparison at the fusion-encoder hot shape."""
    from efficientsam3_tpu.ops.pallas.flash_attention import flash_sdpa

    b, h, lq, lk, d = 1, 8, 5216, 5216, 32
    kb = jnp.zeros((b, lk), jnp.float32)

    def base(seed):
        q = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(0), seed), (b, h, lq, d),
            jnp.bfloat16,
        )
        k = q * 0.5 + 0.1
        v = q * -0.25 + 0.2
        return q, k, v

    def cur(seed, kb):
        q, k, v = base(seed)
        o = flash_sdpa(q, k, v, kb)
        return jnp.sum(o.astype(jnp.float32)) * 1e-6

    bench_fn("flash current (1,8,5216,32)", cur, (kb,))

    try:
        from efficientsam3_tpu.ops.pallas.flash_attention import flash_sdpa_packed

        def packed(seed, kb):
            q, k, v = base(seed)
            o = flash_sdpa_packed(q, k, v, kb)
            return jnp.sum(o.astype(jnp.float32)) * 1e-6

        bench_fn("flash packed  (1,8,5216,32)", packed, (kb,))
    except ImportError:
        pass


def tracker_breakdown():
    """Per-stage timing of the tracker frame step at the bench config
    (72x72 grid, d=256, 8 object slots, all 7 memories valid)."""
    import numpy as np

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    _, tracker = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    tvars = init_tracker_variables(tracker, jax.random.PRNGKey(0))
    fs, d, md = tracker.feat_size, tracker.d_model, tracker.mem_dim
    s_obj = 8

    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.rand(fs * fs, d), jnp.float32)
    mem = jnp.asarray(
        rs.rand(s_obj, tracker.num_maskmem, fs, fs, md), jnp.float32
    )
    tpos = jnp.zeros((s_obj, tracker.num_maskmem), jnp.int32)
    mvalid = jnp.ones((s_obj, tracker.num_maskmem), bool)
    ptrs = jnp.asarray(rs.rand(s_obj, tracker.max_obj_ptrs, d), jnp.float32)
    tdiff = jnp.ones((s_obj, tracker.max_obj_ptrs), jnp.float32)
    pvalid = jnp.ones((s_obj, tracker.max_obj_ptrs), bool)
    s0 = jnp.asarray(rs.rand(s_obj, 4 * fs, 4 * fs, d // 8), jnp.float32)
    s1 = jnp.asarray(rs.rand(s_obj, 2 * fs, 2 * fs, d // 4), jnp.float32)

    def tok_of(seed):
        return jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(11), seed),
            (s_obj, fs * fs, d), jnp.float32,
        )

    def cond_sum(seed, v, pos, mem, tpos, mvalid, ptrs, tdiff, pvalid):
        cond = tracker.apply(
            v, tok_of(seed), pos, mem, tpos, mvalid, ptrs, tdiff, pvalid,
            method=tracker.condition_features,
        )
        return jnp.sum(cond.astype(jnp.float32)) * 1e-6

    bench_fn("condition_features (8 slots, 7 mem)", cond_sum,
             (tvars, pos, mem, tpos, mvalid, ptrs, tdiff, pvalid))

    def heads_sum(seed, v, s0, s1):
        pix = tok_of(seed).reshape(s_obj, fs, fs, d)
        coords = jnp.zeros((s_obj, 1, 2))
        labels = -jnp.ones((s_obj, 1), jnp.int32)
        heads = tracker.apply(
            v, pix, coords, labels, (s0, s1), True,
            method=tracker.forward_sam_heads,
        )
        return (
            jnp.sum(heads["low_res_masks"].astype(jnp.float32)) * 1e-6
            + jnp.sum(heads["obj_ptr"].astype(jnp.float32))
        )

    bench_fn("forward_sam_heads (8 slots)", heads_sum, (tvars, s0, s1))

    def mem_sum(seed, v):
        tok = tok_of(seed)
        hi = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(12), seed),
            (s_obj, 1, tracker.image_size, tracker.image_size), jnp.float32,
        )
        m = tracker.apply(
            v, tok, hi, jnp.ones((s_obj, 1)), False,
            method=tracker.encode_memory,
        )
        return jnp.sum(m.astype(jnp.float32)) * 1e-6

    bench_fn("encode_memory (8 slots)", mem_sum, (tvars,), n=16)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fusion"
    if which == "fusion":
        fusion_attention()
    elif which == "tracker":
        tracker_breakdown()
