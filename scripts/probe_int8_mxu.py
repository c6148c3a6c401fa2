"""Probe: does Mosaic lower int8 x int8 -> int32 dots onto the v5e MXU at
the expected ~2x bf16 rate at the tracker's memory-attention block shapes?

Run on the real chip. Prints ms per (768, 256) @ (256, 2048) block chain for
bf16 and int8 operands plus the achieved TOPS; decides whether the
quantized-bank memattn path (ops/pallas/flash_attention.flash_memattn_q8)
is worth building out.
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, y_ref, o_ref, *, n_iter, dtype):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    x = x_ref[...]
    y = y_ref[...]
    for i in range(n_iter):
        if dtype == jnp.int8:
            d = jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc += d.astype(jnp.float32) * (1.0 + i)
        else:
            d = jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += d * (1.0 + i)
    o_ref[...] = acc


def bench_dot(dtype, m=768, k=256, n=2048, n_iter=64, reps=20):
    if dtype == jnp.int8:
        x = jnp.asarray(
            np.random.randint(-127, 127, (m, k)), jnp.int8)
        y = jnp.asarray(
            np.random.randint(-127, 127, (k, n)), jnp.int8)
    else:
        x = jnp.asarray(np.random.randn(m, k), dtype)
        y = jnp.asarray(np.random.randn(k, n), dtype)
    fn = pl.pallas_call(
        functools.partial(_kernel, n_iter=n_iter, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )

    @jax.jit
    def run(x, y):
        def body(c, _):
            return c + fn(x, y)[0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return out

    run(x, y).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(x, y).block_until_ready()
    dt = time.perf_counter() - t0
    flops = 2 * m * k * n * n_iter * reps
    ms_per_call = dt * 1e3 / reps
    print(f"{jnp.dtype(dtype).name}: {ms_per_call:.4f} ms / {n_iter}-dot call "
          f"-> {flops / dt / 1e12:.1f} T(FL)OPS")
    return ms_per_call


if __name__ == "__main__":
    print("devices:", jax.devices())
    bf16 = bench_dot(jnp.bfloat16)
    i8 = bench_dot(jnp.int8)
    print(f"int8 speedup vs bf16: {bf16 / i8:.2f}x")
