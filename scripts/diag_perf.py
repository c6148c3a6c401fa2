#!/usr/bin/env python
"""Perf diagnostics on the real chip: per-stage grounding cost at batch 1
and batch 8, plus isolated fusion-encoder and attention micro-timings.

Uses bench.py's forced-execution two-point scan methodology (the tunnel's
block_until_ready returns early; see bench.py docstring). This is the
working tool behind the batch-8-regression and <10 ms investigations
(VERDICT r2 #2/#4); bench.py stays the metric of record.

Usage: python scripts/diag_perf.py [--stages] [--fusion] [--batch N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax
import jax.numpy as jnp

from bench import two_point_step_time


def tracker_breakdown():
    """Time each piece of the cached tracker step at 8 slots: memory
    attention (cached), SAM heads, encode_memory, new-entry k/v projection."""
    import numpy as np

    from efficientsam3_tpu.build import build_efficientsam3_video_model

    _, tracker = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    rng = jax.random.PRNGKey(0)
    tvars = init_tracker_variables(tracker, rng)
    fs, d, md = tracker.feat_size, tracker.d_model, tracker.mem_dim
    s_obj, n_mem = 8, tracker.num_maskmem

    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.rand(fs * fs, d), jnp.float32)
    mem = jnp.asarray(rs.rand(s_obj, n_mem, fs, fs, md), jnp.float32)
    tpos = jnp.zeros((s_obj, n_mem), jnp.int32)
    mvalid = jnp.ones((s_obj, n_mem), bool)
    ptrs = jnp.asarray(rs.rand(s_obj, tracker.max_obj_ptrs, d), jnp.float32)
    tdiff = jnp.ones((s_obj, tracker.max_obj_ptrs), jnp.float32)
    pvalid = jnp.ones((s_obj, tracker.max_obj_ptrs), bool)
    s0 = jnp.asarray(rs.rand(s_obj, 4 * fs, 4 * fs, d // 8), jnp.float32)
    s1 = jnp.asarray(rs.rand(s_obj, 2 * fs, 2 * fs, d // 4), jnp.float32)

    pe = jax.jit(lambda v, m: tracker.apply(v, m, method=tracker.encode_memory_kv))
    k_entries, v_entries = zip(*(pe(tvars, mem[:, i]) for i in range(n_mem)))
    from efficientsam3_tpu.video.tracker import flatten_kv_bank

    k_bank, v_bank = flatten_kv_bank(k_entries, v_entries)
    delta = jax.jit(lambda v: tracker.apply(v, method=tracker.tpos_k_delta))(tvars)

    def tok_of(seed):
        return jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(11), seed),
            (s_obj, fs * fs, d), jnp.float32,
        )

    def attn_sum(seed, v, pos, kb, vb, tpos, mvalid, ptrs, tdiff, pvalid, dl):
        cond = tracker.apply(
            v, tok_of(seed), pos, kb, vb, tpos, mvalid, ptrs, tdiff, pvalid,
            dl, shared_ages=True,
            method=tracker.condition_features_cached,
        )
        return jnp.sum(cond.astype(jnp.float32)) * 1e-6

    def heads_sum(seed, v, s0, s1):
        pix = tok_of(seed).reshape(s_obj, fs, fs, d)
        heads = tracker.apply(
            v, pix, jnp.zeros((s_obj, 1, 2)), -jnp.ones((s_obj, 1), jnp.int32),
            (s0, s1), True, method=tracker.forward_sam_heads,
        )
        return (jnp.sum(heads["low_res_masks"].astype(jnp.float32)) * 1e-6
                + jnp.sum(heads["obj_ptr"].astype(jnp.float32)))

    def encmem_sum(seed, v):
        masks = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(12), seed),
            (s_obj, 1, tracker.image_size, tracker.image_size), jnp.float32,
        ) * 8 - 4
        m = tracker.apply(v, tok_of(seed), masks, jnp.ones((s_obj, 1)), False,
                          method=tracker.encode_memory)
        return jnp.sum(m.astype(jnp.float32)) * 1e-6

    def kv_sum(seed, v):
        m = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(13), seed),
            (s_obj, fs, fs, md), jnp.float32,
        )
        k, vr = tracker.apply(v, m, method=tracker.encode_memory_kv)
        return (jnp.sum(k.astype(jnp.float32)) * 1e-6
                + jnp.sum(vr.astype(jnp.float32)) * 1e-6)

    for name, fn, n, fargs in (
        ("memattn_cached", attn_sum, 16,
         (tvars, pos, k_bank, v_bank, tpos, mvalid, ptrs, tdiff, pvalid, delta)),
        ("sam_heads", heads_sum, 32, (tvars, s0, s1)),
        ("encode_memory", encmem_sum, 32, (tvars,)),
        ("encode_memory_kv", kv_sum, 32, (tvars,)),
    ):
        t = two_point_step_time(jax, jnp, fn, n, fargs) * 1e3
        print(f"  tracker[{name}] = {t:.3f} ms", flush=True)


def measure_hbm_bw():
    """Measured HBM bandwidth via a big elementwise triad (read 2 arrays +
    write 1): bytes_moved / step_time."""
    n = 64 * 1024 * 1024  # 256 MB fp32 per array

    def triad_sum(seed, a, b):
        s = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(1), seed), ())
        c = a * s + b
        return c[::65536].astype(jnp.float32).sum()

    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)
    sec = two_point_step_time(jax, jnp, triad_sum, 8, (a, b))
    return 3 * n * 4 / sec  # bytes/s


def roofline():
    """Per-stage roofline table (VERDICT r4 next #7): FLOPs and HBM bytes
    from XLA cost analysis of each cumulative prefix (differenced), joined
    with measured stage times and per-stage achievable floors at the
    measured matmul ceiling / HBM bandwidth. Emits the markdown table for
    docs/performance.md."""
    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.models.geometry import Prompt

    model, _ = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 1008, 1008, 3), jnp.float32)
    tokens = jnp.zeros((1, 32), jnp.int32)
    prompt = Prompt.empty(1, 4, 4)
    variables = jax.jit(model.init)(rng, img, tokens, prompt)

    # text features cached per prompt, like bench.py's per-frame program
    tmem, tmask = jax.jit(
        lambda v, t: model.apply(v, t, method=model.encode_text)
    )(variables, tokens)

    def prefix(v, x, what):
        if what == "trunk":
            r = model.apply(v, x, method=lambda m, a: m.trunk(a, train=False))
            return jnp.sum(r.astype(jnp.float32)) * 1e-6
        img_out = model.apply(v, x, method=model.encode_image)
        acc = sum(jnp.sum(f.astype(jnp.float32)) for f in img_out["fpn"]) * 1e-6
        if what == "image":
            return acc
        out = model.apply(
            v, img_out["fpn"], img_out["pos"], tmem, tmask, prompt,
            stage=what if what != "full" else None, method=model.ground,
        )
        acc += jnp.sum(out["encoder_hidden_states"].astype(jnp.float32)) * 1e-6
        if what in ("decoder", "full"):
            acc += jnp.sum(out["pred_logits"].astype(jnp.float32))
            acc += jnp.sum(out["pred_boxes"].astype(jnp.float32))
        if what == "full":
            acc += jnp.sum(out["pred_masks"].astype(jnp.float32)) * 1e-6
        return acc

    costs = {}
    for what in ("trunk", "image", "fusion", "decoder", "full"):
        f = jax.jit(lambda v, x, w=what: prefix(v, x, w))
        c = f.lower(variables, img).compile().cost_analysis()
        costs[what] = (
            float(c.get("flops", 0.0)),
            float(c.get("bytes accessed", 0.0)),
        )
        print(f"  cum[{what}]: {costs[what][0] / 1e9:.1f} GFLOP, "
              f"{costs[what][1] / 1e9:.2f} GB", flush=True)

    bw = measure_hbm_bw()
    print(f"  measured HBM triad bandwidth: {bw / 1e9:.0f} GB/s", flush=True)

    # measured per-stage times (same methodology as bench.py)
    def prefix_sum(seed, v, what):
        x = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(7), seed),
            (1, 1008, 1008, 3), jnp.float32,
        )
        return prefix(v, x, what)

    cum_ms = {}
    for what, n in (("trunk", 16), ("image", 16), ("fusion", 8),
                    ("decoder", 8), ("full", 8)):
        cum_ms[what] = two_point_step_time(
            jax, jnp, lambda s, v, w=what: prefix_sum(s, v, w), n, (variables,)
        ) * 1e3
        print(f"  cum_ms[{what}] = {cum_ms[what]:.3f}", flush=True)

    order = ["trunk", "image", "fusion", "decoder", "full"]
    names = {"trunk": "trunk", "image": "neck", "fusion": "text_geo_fusion",
             "decoder": "decoder_scoring", "full": "seg_head"}
    mxu = 135e12  # measured sustained bf16 matmul ceiling (docs)
    print("\n| stage | GFLOP | GB moved | bound | floor ms | measured ms | "
          "% of floor |")
    print("|---|---|---|---|---|---|---|")
    prev_f = prev_b = prev_t = 0.0
    tot_floor = 0.0
    for what in order:
        f, b = costs[what]
        df, db = f - prev_f, b - prev_b
        dt = cum_ms[what] - prev_t
        prev_f, prev_b, prev_t = f, b, cum_ms[what]
        t_mxu = df / mxu * 1e3
        t_bw = db / bw * 1e3
        floor = max(t_mxu, t_bw)
        tot_floor += floor
        bound = "MXU" if t_mxu >= t_bw else "HBM"
        print(f"| {names[what]} | {df / 1e9:.1f} | {db / 1e9:.3f} | {bound} "
              f"| {floor:.2f} | {dt:.2f} | {floor / max(dt, 1e-9) * 100:.0f}% |")
    print(f"\ntotal floor {tot_floor:.2f} ms vs measured "
          f"{cum_ms['full']:.2f} ms", flush=True)


def fusion_breakdown():
    """Decompose the text_geo_fusion bench bucket (VERDICT r4 next #1):
    text tower / geometry encoder / fusion encoder, then the fusion layer
    pieces (flash self-attn, einsum cross-attn, FFN) at exact hot shapes.
    Each piece is its own scanned program; the full-minus-sum residual is
    reported so misattribution is visible."""
    import numpy as np

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.models.geometry import Prompt

    model, _ = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 1008, 1008, 3), jnp.float32)
    tokens = jnp.zeros((1, 32), jnp.int32)
    prompt = Prompt.empty(1, 4, 4)
    variables = jax.jit(model.init)(rng, img, tokens, prompt)

    b, n, c = 1, 72 * 72, model.d_model
    pos = jnp.asarray(np.random.RandomState(1).rand(n, c), jnp.float32)

    def tok_of(seed, shape):
        return jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(11), seed), shape
        )

    # 1) text tower alone (MobileCLIP-S0 student, ctx 32)
    def text_sum(seed, v):
        toks = jnp.clip(
            jax.random.randint(
                jax.random.fold_in(jax.random.PRNGKey(2), seed),
                (1, 32), 0, 30000),
            0, 49407).astype(jnp.int32)
        tm, _ = model.apply(v, toks, method=model.encode_text)
        return jnp.sum(tm.astype(jnp.float32)) * 1e-3

    # 2) geometry encoder alone
    def geo_sum(seed, v):
        it = tok_of(seed, (b, n, c))
        gt, gm = model.apply(
            v, prompt, it, (72, 72), pos,
            method=lambda m, *a: m.geometry_encoder(*a),
        )
        return jnp.sum(gt.astype(jnp.float32)) * 1e-3

    # 3) fusion encoder alone at exact shapes (text 32 + geo tokens)
    gt0, gm0 = model.apply(
        variables, prompt, jnp.zeros((b, n, c)), (72, 72), pos,
        method=lambda m, *a: m.geometry_encoder(*a),
    )
    m_geo = gt0.shape[1]
    full_prompt0 = jnp.zeros((b, 32 + m_geo, c))
    full_mask0 = jnp.concatenate(
        [jnp.zeros((b, 32), bool), gm0], axis=1
    )

    def fusion_sum(seed, v):
        it = tok_of(seed, (b, n, c))
        out = model.apply(
            v, it, pos, full_prompt0, full_mask0,
            method=lambda m, *a: m.fusion_encoder(*a),
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-6

    results = {}
    for name, fn, reps in (
        ("text_tower", text_sum, 32),
        ("geometry", geo_sum, 32),
        ("fusion_encoder_6l", fusion_sum, 16),
    ):
        t = two_point_step_time(jax, jnp, fn, reps, (variables,)) * 1e3
        results[name] = t
        print(f"  fusion[{name}] = {t:.3f} ms", flush=True)

    # 4) per-piece micro-times at exact shapes (x1 layer; full layer stack
    #    is 6x). Separate modules with fresh inits — same shapes/dtypes.
    from efficientsam3_tpu.models.common import MultiheadAttention
    import flax.linen as fnn

    m_tot = 32 + m_geo

    class SelfAttn(fnn.Module):
        @fnn.compact
        def __call__(self, x, qpos):
            xn = fnn.LayerNorm(epsilon=1e-5)(x)
            return MultiheadAttention(c, 8, dtype=jnp.bfloat16)(
                xn + qpos, xn + qpos, xn)

    class CrossAttn(fnn.Module):
        @fnn.compact
        def __call__(self, x, mem, mask):
            xn = fnn.LayerNorm(epsilon=1e-5)(x)
            return MultiheadAttention(c, 8, dtype=jnp.bfloat16)(
                xn, mem, mem, key_padding_mask=mask)

    class FFN(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            xn = fnn.LayerNorm(epsilon=1e-5)(x)
            h = fnn.Dense(2048, dtype=jnp.bfloat16)(xn)
            return fnn.Dense(c, dtype=jnp.bfloat16)(fnn.relu(h))

    x0 = jnp.zeros((b, n, c))
    mem0 = jnp.zeros((b, m_tot, c))
    mask0 = jnp.zeros((b, m_tot), bool)
    sa, ca, ff = SelfAttn(), CrossAttn(), FFN()
    sav = jax.jit(sa.init)(rng, x0, pos[None])
    cav = jax.jit(ca.init)(rng, x0, mem0, mask0)
    ffv = jax.jit(ff.init)(rng, x0)

    pieces = (
        ("self_attn_1l", lambda s, v: jnp.sum(
            sa.apply(v, tok_of(s, (b, n, c)), pos[None]).astype(jnp.float32)
        ) * 1e-6, sav, 16),
        ("cross_attn_1l", lambda s, v: jnp.sum(
            ca.apply(v, tok_of(s, (b, n, c)), mem0, mask0).astype(jnp.float32)
        ) * 1e-6, cav, 32),
        ("ffn_1l", lambda s, v: jnp.sum(
            ff.apply(v, tok_of(s, (b, n, c))).astype(jnp.float32)
        ) * 1e-6, ffv, 32),
    )
    per_layer = 0.0
    for name, fn, v, reps in pieces:
        t = two_point_step_time(jax, jnp, fn, reps, (v,)) * 1e3
        per_layer += t
        print(f"  fusion[{name}] = {t:.3f} ms (x6 = {t * 6:.3f})", flush=True)
    resid = results["fusion_encoder_6l"] - per_layer * 6
    print(f"  fusion[residual] = {resid:.3f} ms "
          f"(6l total {results['fusion_encoder_6l']:.3f} - pieces "
          f"{per_layer * 6:.3f})", flush=True)
    print(f"  bucket sum (text+geo+fusion) = "
          f"{results['text_tower'] + results['geometry'] + results['fusion_encoder_6l']:.3f} ms",
          flush=True)


def seg_breakdown():
    """Isolate seg-head cost: pixel decoder convs, GN, mask einsum."""
    import numpy as np

    from efficientsam3_tpu.models.seg_head import UniversalSegmentationHead

    head = UniversalSegmentationHead(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    b, d = 1, 256
    f288 = jnp.zeros((b, 288, 288, d), jnp.bfloat16)
    f144 = jnp.zeros((b, 144, 144, d), jnp.bfloat16)
    enc = jnp.zeros((b, 72 * 72, d), jnp.bfloat16)
    q = jnp.zeros((b, 400, d), jnp.bfloat16)
    pr = jnp.zeros((b, 36, d), jnp.bfloat16)
    pm = jnp.zeros((b, 36), bool)
    hv = jax.jit(head.init)(rng, [f288, f144, jnp.zeros((b, 72, 72, d),
                            jnp.bfloat16)], q, enc, pr, pm)

    def run_sum(seed, v, nq):
        key = jax.random.fold_in(jax.random.PRNGKey(5), seed)
        a = jax.random.uniform(key, (b, 288, 288, d), jnp.bfloat16)
        bq = jax.random.uniform(key, (b, nq, d), jnp.bfloat16)
        e = jax.random.uniform(key, (b, 72 * 72, d), jnp.bfloat16)
        out = head.apply(v, [a, f144, jnp.zeros((b, 72, 72, d), jnp.bfloat16)],
                         bq, e, pr, pm)
        return (jnp.sum(out["pred_masks"].astype(jnp.float32)) * 1e-6
                + jnp.sum(out["semantic_seg"].astype(jnp.float32)) * 1e-6)

    for nq in (400, 200, 8):
        t = two_point_step_time(
            jax, jnp, lambda s, v, q_=nq: run_sum(s, v, q_), 16, (hv,)
        ) * 1e3
        print(f"  seg_head[{nq} queries] = {t:.3f} ms", flush=True)


def trunk_breakdown():
    """Cumulative-prefix timing of the EfficientViT-b1 trunk stages at
    1008² — localizes the ~3.5 ms trunk cost (stem/stage1/2/3/4)."""
    import flax.linen as fnn

    from efficientsam3_tpu.models.efficientvit import (
        ConvNormAct, DSConv, EfficientViTBlock, MBConv, efficientvit_b1,
    )

    net = efficientvit_b1(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 1008, 1008, 3), jnp.float32)
    variables = jax.jit(net.init)(rng, x0)

    # prefix runner: call the backbone but stop after `upto` top-level
    # stages by monkey-layering: easiest is to re-run the full apply and
    # sum an intermediate via capture_intermediates filtering — instead we
    # exploit DCE: sum only the output of the first `upto` stages by
    # re-declaring a sliced module graph is invasive; capture_intermediates
    # keeps all, so do the simple thing: time nested prefixes with
    # fnn.apply on a sliced copy of the backbone.
    class Sliced(fnn.Module):
        upto: str

        @fnn.compact
        def __call__(self, x):
            w = (16, 32, 64, 128, 256)
            d = (1, 2, 3, 3, 4)
            x = ConvNormAct(w[0], 3, 2, norm="bn2d", act="hswish",
                            dtype=jnp.bfloat16, name="stem_conv")(x)
            for i in range(d[0]):
                x = x + DSConv(w[0], 1, act=("hswish", None),
                               dtype=jnp.bfloat16, name=f"stem_block_{i}")(x)
            if self.upto == "stem":
                return x
            for s, (ws, ds) in enumerate(zip(w[1:3], d[1:3]), start=1):
                for i in range(ds):
                    stride = 2 if i == 0 else 1
                    y = MBConv(ws, stride, 4.0,
                               act=("hswish", "hswish", None),
                               dtype=jnp.bfloat16,
                               name=f"stage{s}_block_{i}")(x)
                    x = y if stride == 2 else x + y
                if self.upto == f"stage{s}":
                    return x
            for s, (ws, ds) in enumerate(zip(w[3:], d[3:]), start=3):
                x = MBConv(ws, 2, 4.0, use_bias=(True, True, False),
                           norm=(None, None, "bn2d"),
                           act=("hswish", "hswish", None),
                           dtype=jnp.bfloat16, name=f"stage{s}_down")(x)
                for i in range(ds):
                    x = EfficientViTBlock(head_dim=16, expand_ratio=4.0,
                                          dtype=jnp.bfloat16,
                                          name=f"stage{s}_block_{i}")(x)
                if self.upto == f"stage{s}":
                    return x
            return x

    prev = 0.0
    for upto in ("stem", "stage1", "stage2", "stage3", "stage4"):
        mod = Sliced(upto)

        def run_sum(seed, v, m=mod):
            x = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(7), seed),
                (1, 1008, 1008, 3), jnp.float32,
            )
            r = m.apply(v, x)
            return jnp.sum(r.astype(jnp.float32)) * 1e-6
        t = two_point_step_time(jax, jnp, run_sum, 16, (variables,)) * 1e3
        print(f"  trunk cum[{upto}] = {t:.3f} ms (+{t - prev:.3f})",
              flush=True)
        prev = t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--fusion", action="store_true")
    ap.add_argument("--tracker", action="store_true",
                    help="per-piece breakdown of the cached tracker step")
    ap.add_argument("--fusion-breakdown", action="store_true",
                    help="decompose the text_geo_fusion bucket")
    ap.add_argument("--roofline", action="store_true",
                    help="per-stage FLOPs/bytes/floor vs measured table")
    ap.add_argument("--seg", action="store_true",
                    help="seg-head component micro-timings")
    ap.add_argument("--trunk", action="store_true",
                    help="trunk per-stage cumulative timings")
    args = ap.parse_args()

    if args.tracker:
        tracker_breakdown()
        return
    if args.fusion_breakdown:
        fusion_breakdown()
        return
    if args.roofline:
        roofline()
        return
    if args.seg:
        seg_breakdown()
        return
    if args.trunk:
        trunk_breakdown()
        return

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.models.geometry import Prompt

    model, _ = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 1008, 1008, 3), jnp.float32)
    tokens = jnp.zeros((1, 32), jnp.int32)
    variables = jax.jit(model.init)(rng, img, tokens, Prompt.empty(1, 4, 4))

    def prefix_sum(seed, v, what, batch):
        x = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(7), seed),
            (batch, 1008, 1008, 3), jnp.float32,
        )
        toks = jnp.zeros((batch, 32), jnp.int32)
        pr = Prompt.empty(batch, 4, 4)
        if what == "trunk":
            r = model.apply(v, x, method=lambda m, a: m.trunk(a, train=False))
            return jnp.sum(r.astype(jnp.float32)) * 1e-6
        if what == "image":
            r = model.apply(v, x, method=model.encode_image)
            return sum(jnp.sum(f.astype(jnp.float32)) for f in r["fpn"]) * 1e-6
        out = model.apply(v, x, toks, pr, stage=what if what != "full" else None)
        acc = 0.0
        if what in ("fusion", "decoder"):
            acc += jnp.sum(out["encoder_hidden_states"].astype(jnp.float32)) * 1e-6
        if what == "decoder":
            acc += jnp.sum(out["pred_logits"].astype(jnp.float32))
        if what == "full":
            acc += (
                jnp.sum(out["pred_logits"].astype(jnp.float32))
                + jnp.sum(out["pred_boxes"].astype(jnp.float32))
                + jnp.sum(out["pred_masks"].astype(jnp.float32)) * 1e-6
            )
        return acc

    for batch in [int(b) for b in args.batches.split(",")]:
        n = max(2, 16 // batch)
        cum = {}
        stages = ["full"] if args.no_stages else [
            "trunk", "image", "fusion", "decoder", "full",
        ]
        for what in stages:
            cum[what] = two_point_step_time(
                jax, jnp,
                lambda s, v, w=what, b=batch: prefix_sum(s, v, w, b),
                n, (variables,),
            ) * 1e3
            print(f"  B={batch} cum[{what}] = {cum[what]:.3f} ms", flush=True)
        if not args.no_stages:
            print(
                f"B={batch} stages: trunk {cum['trunk']:.2f} | "
                f"neck {cum['image'] - cum['trunk']:.2f} | "
                f"fusion {cum['fusion'] - cum['image']:.2f} | "
                f"decoder {cum['decoder'] - cum['fusion']:.2f} | "
                f"seg {cum['full'] - cum['decoder']:.2f} | "
                f"total {cum['full']:.2f} ms "
                f"({batch / cum['full'] * 1e3:.1f} img/s)",
                flush=True,
            )

    if args.fusion:
        from efficientsam3_tpu.models.fusion_encoder import FusionEncoder

        enc = FusionEncoder(dtype=jnp.bfloat16)
        b, npix, m, c = 1, 5184, 36, 256
        pos = jnp.zeros((npix, c))
        src0 = jnp.zeros((b, npix, c))
        prm = jnp.zeros((b, m, c))
        ev = jax.jit(enc.init)(rng, src0, pos, prm)

        def fuse_sum(seed, v):
            x = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(3), seed), (b, npix, c)
            )
            o = enc.apply(v, x, pos, prm)
            return jnp.sum(o.astype(jnp.float32)) * 1e-6

        t = two_point_step_time(jax, jnp, fuse_sum, 16, (ev,)) * 1e3
        print(f"fusion encoder alone (6 layers): {t:.3f} ms "
              f"({t / 6:.3f} ms/layer)", flush=True)


if __name__ == "__main__":
    main()
