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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fusion"
    if which == "fusion":
        fusion_attention()
