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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--fusion", action="store_true")
    args = ap.parse_args()

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
