#!/usr/bin/env python
"""Exact op-level attribution of a jitted step via the JAX profiler.

Prefix-differencing (bench.py stage_ms) measures stages by subtracting
cumulative programs, which is robust to tunnel RTT but blind inside a
bucket and sensitive to XLA fusing differently across prefixes (the r4
text_geo_fusion "regression" suspicion — VERDICT r4 weak #2). The axon
PJRT plugin supports jax.profiler, so this script traces the REAL
compiled program and aggregates per-HLO-fusion device times, then maps
fusion names back to model ops via the compiled HLO text.

Usage:
  python scripts/profile_step.py                 # grounding step (b1, 1008^2)
  python scripts/profile_step.py --what tracker  # cached tracker step
  python scripts/profile_step.py --batch 8
  python scripts/profile_step.py --top 60 --min-ms 0.01
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_grounding(batch):
    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.models.geometry import Prompt

    model, _ = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((batch, 1008, 1008, 3), jnp.float32)
    tokens = jnp.zeros((batch, 32), jnp.int32)
    prompt = Prompt.empty(batch, 4, 4)
    variables = jax.jit(model.init)(
        rng, img[:1], tokens[:1], Prompt.empty(1, 4, 4)
    )

    @jax.jit
    def step(v, x, t, p):
        out = model.apply(v, x, t, p)
        return (
            jnp.sum(out["pred_logits"].astype(jnp.float32))
            + jnp.sum(out["pred_boxes"].astype(jnp.float32))
            + jnp.sum(out["pred_masks"].astype(jnp.float32)) * 1e-6
        )

    x = jax.random.uniform(rng, img.shape, jnp.float32)
    return step, (variables, x, tokens, prompt)


def build_tracker():
    """Cached-bank tracker step, mirroring bench.py's track_cached_sum
    exactly (same shapes, same sub-calls) so the profile attributes the
    metric of record."""
    import numpy as np

    from efficientsam3_tpu.build import build_efficientsam3_video_model
    from efficientsam3_tpu.video.tracker import init_tracker_variables

    _, tracker = build_efficientsam3_video_model(
        backbone_type="efficientvit", model_name="b1",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=32,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    tvars = init_tracker_variables(tracker, rng)
    fs, d, md = tracker.feat_size, tracker.d_model, tracker.mem_dim
    s_obj = 8
    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.rand(fs * fs, d), jnp.float32)
    mem = jnp.asarray(
        rs.rand(s_obj, tracker.num_maskmem, fs, fs, md), jnp.float32)
    tpos = jnp.zeros((s_obj, tracker.num_maskmem), jnp.int32)
    mvalid = jnp.ones((s_obj, tracker.num_maskmem), bool)
    ptrs = jnp.asarray(rs.rand(s_obj, tracker.max_obj_ptrs, d), jnp.float32)
    tdiff = jnp.ones((s_obj, tracker.max_obj_ptrs), jnp.float32)
    pvalid = jnp.ones((s_obj, tracker.max_obj_ptrs), bool)
    s0 = jnp.asarray(rs.rand(s_obj, 4 * fs, 4 * fs, d // 8), jnp.float32)
    s1 = jnp.asarray(rs.rand(s_obj, 2 * fs, 2 * fs, d // 4), jnp.float32)
    n_mem = tracker.num_maskmem
    pe = jax.jit(
        lambda v, m: tracker.apply(v, m, method=tracker.encode_memory_kv))
    k_entries, v_entries = zip(*(pe(tvars, mem[:, i]) for i in range(n_mem)))
    from efficientsam3_tpu.video.tracker import flatten_kv_bank

    k_bank0, v_bank0 = flatten_kv_bank(k_entries, v_entries)
    kv_delta = jax.jit(
        lambda v: tracker.apply(v, method=tracker.tpos_k_delta))(tvars)
    tok = jax.random.uniform(
        jax.random.PRNGKey(11), (s_obj, fs * fs, d), jnp.float32)

    import functools

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def step(v, tok, pos, k_bank, v_bank, k_e, v_e, delta):
        # persistent flat bank in predictor state: one column DUS per frame,
        # in place (banks donated + returned, like the predictor's buffers)
        k_bank = jax.lax.dynamic_update_slice(k_bank, k_e, (0, 0, 0, 0))
        v_bank = jax.lax.dynamic_update_slice(v_bank, v_e, (0, 0, 0))
        cond = tracker.apply(
            v, tok, pos, k_bank, v_bank, tpos, mvalid, ptrs, tdiff, pvalid,
            delta, shared_ages=True,
            method=tracker.condition_features_cached,
        )
        pix = cond.reshape(s_obj, fs, fs, d)
        coords = jnp.zeros((s_obj, 1, 2))
        labels = -jnp.ones((s_obj, 1), jnp.int32)
        heads = tracker.apply(
            v, pix, coords, labels, (s0, s1), True,
            method=tracker.forward_sam_heads,
        )
        mem_new = tracker.apply(
            v, tok, heads["high_res_masks"], heads["object_score_logits"],
            False, method=tracker.encode_memory,
        )
        k_new, v_new = tracker.apply(
            v, mem_new, method=tracker.encode_memory_kv)
        return (
            jnp.sum(heads["low_res_masks"].astype(jnp.float32)) * 1e-6
            + jnp.sum(heads["obj_ptr"].astype(jnp.float32))
            + jnp.sum(k_new.astype(jnp.float32)) * 1e-6
            + jnp.sum(v_new.astype(jnp.float32)) * 1e-6
        ), (k_bank, v_bank)

    def step_persistent(v, tok, pos, k_bank, v_bank, k_e, v_e, delta,
                        _st={}):
        kb, vb = _st.get("banks", (k_bank, v_bank))
        out, _st["banks"] = step(v, tok, pos, kb, vb, k_e, v_e, delta)
        return out

    return step_persistent, (tvars, tok, pos, k_bank0, v_bank0,
                             k_entries[0], v_entries[0], kv_delta)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="grounding",
                    choices=["grounding", "tracker"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--min-ms", type=float, default=0.005)
    ap.add_argument("--hlo-map", action="store_true",
                    help="grep the compiled HLO for each hot fusion's ops")
    args = ap.parse_args()

    if args.what == "grounding":
        step, sargs = build_grounding(args.batch)
    else:
        step, sargs = build_tracker()

    # warm up / compile
    step(*sargs).block_until_ready()
    step(*sargs).block_until_ready()

    d = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(d):
        for _ in range(args.iters):
            step(*sargs).block_until_ready()

    tj = sorted(glob.glob(d + "/plugins/profile/*/*.trace.json.gz"))[-1]
    ev = json.load(gzip.open(tj))["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if n and "TPU" in n}
    durs = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            name = e["name"]
            if name.startswith("jit_"):
                total += e["dur"]
                continue
            durs[name] += e["dur"]

    n = args.iters
    print(f"== {args.what} batch={args.batch}: device total "
          f"{total / n / 1e3:.3f} ms/iter over {n} iters ==")
    shown = 0.0
    rows = []
    for name, us in durs.most_common():
        ms = us / n / 1e3
        if ms < args.min_ms or shown / max(total, 1) > 0.999:
            break
        shown += us
        rows.append((ms, name))
        print(f"  {ms:8.3f} ms  {name}")
        if len(rows) >= args.top:
            break
    rest = (total - shown) / n / 1e3
    print(f"  {rest:8.3f} ms  (everything else)")

    if args.hlo_map:
        lowered = jax.jit(step).lower(*sargs) if False else None  # noqa
        # map hot fusion names to their component HLO ops
        compiled = step.lower(*sargs).compile()
        hlo = compiled.as_text()
        for ms, name in rows[: min(len(rows), 20)]:
            base = name.split("(")[0].strip()
            # fusion computations are named `%fused_computation.N` or the
            # instruction name itself; grep nearby dot/conv lines
            pat = re.compile(
                r"^\s*(?:ROOT )?%?" + re.escape(base) + r"\b.*", re.M)
            m = pat.search(hlo)
            if not m:
                continue
            line = m.group(0)
            calls = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
            ops = []
            if calls:
                cpat = re.compile(
                    r"%?" + re.escape(calls.group(1)) + r"\s*\([^)]*\)[^{]*\{")
                cm = cpat.search(hlo)
                if cm:
                    body = hlo[cm.end(): hlo.find("\n}", cm.end())]
                    ops = re.findall(
                        r"\b(dot|convolution|custom-call|reduce|exp|scatter|"
                        r"gather|transpose)\(", body)
            kinds = collections.Counter(ops)
            meta = re.search(r'metadata=\{[^}]*op_name="([^"]+)"', line)
            print(f"  MAP {base}: {dict(kinds)} "
                  f"{meta.group(1) if meta else ''}")


if __name__ == "__main__":
    main()
