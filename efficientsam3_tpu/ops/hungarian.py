"""Exact Hungarian assignment on device (no host callback).

The reference solves DETR matching with scipy.linear_sum_assignment on the
host every training step (sam3/sam3/train/matcher.py). A host round-trip
per step stalls the TPU pipeline (and jax host callbacks are unsupported on
some PJRT backends entirely), so this implements the classic O(T^2 Q)
shortest-augmenting-path Hungarian directly in JAX: the outer loops are
`lax.fori_loop` / `lax.while_loop` with fixed-shape state, and the inner
column relaxation is one vectorized pass over all Q columns (VPU-friendly).

Solves: given cost (T, Q) with T <= Q, assign each row a distinct column
minimizing total cost — identical optima to scipy (assignments may differ
only between equal-cost solutions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(1e18)


@functools.partial(jax.jit, static_argnums=())
def solve_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (T, Q) f32, T <= Q. Returns (T,) int32 column per row."""
    t, q = cost.shape
    costf = cost.astype(jnp.float32)

    # e-maxx formulation with a virtual column 0; columns are 1..Q.
    # p[j]: row currently assigned to column j (0 = none); u/v: potentials.
    def assign_row(i, carry):
        u, v, p = carry  # u: (T+1,), v: (Q+1,), p: (Q+1,) int32

        minv = jnp.full((q + 1,), INF)
        used = jnp.zeros((q + 1,), bool)
        way = jnp.zeros((q + 1,), jnp.int32)
        p = p.at[0].set(i + 1)  # rows are 1-indexed in p
        j0 = jnp.int32(0)

        def path_cond(st):
            u, v, p, minv, used, way, j0 = st
            return p[j0] != 0

        def path_body(st):
            u, v, p, minv, used, way, j0 = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = costf[i0 - 1] - u[i0] - v[1:]
            better = (cur < minv[1:]) & ~used[1:]
            minv = minv.at[1:].set(jnp.where(better, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(better, j0, way[1:]))
            masked = jnp.where(used[1:], INF, minv[1:])
            j1 = jnp.int32(jnp.argmin(masked)) + 1
            delta = masked[j1 - 1]
            # u[p[j]] += delta for used j; v[j] -= delta for used j;
            # minv[j] -= delta for unused j
            u_add = jnp.zeros((t + 1,)).at[p].add(
                jnp.where(used, delta, 0.0), mode="drop"
            )
            u = u + u_add
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            path_cond, path_body, (u, v, p, minv, used, way, j0)
        )

        # augmenting path: walk `way` back to the virtual column
        def aug_cond(st):
            p, j0 = st
            return j0 != 0

        def aug_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u0 = jnp.zeros((t + 1,))
    v0 = jnp.zeros((q + 1,))
    p0 = jnp.zeros((q + 1,), jnp.int32)
    _, _, p = jax.lax.fori_loop(0, t, assign_row, (u0, v0, p0))

    # invert: row (1..T) -> column (1..Q)
    rows = p[1:]  # (Q,) row assigned to each column, 0 = none
    cols = jnp.arange(1, q + 1, dtype=jnp.int32)
    out = jnp.zeros((t + 1,), jnp.int32).at[rows].set(cols, mode="drop")
    return out[1:] - 1  # (T,) 0-indexed column per row


def solve_assignment_batched(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (B, T, Q) -> (B, T) int32 column per row."""
    return jax.vmap(solve_assignment)(cost)
