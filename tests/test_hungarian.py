"""Device-side Hungarian solver vs scipy.linear_sum_assignment."""

import numpy as np
import pytest

import jax.numpy as jnp

from efficientsam3_tpu.ops.hungarian import (
    solve_assignment,
    solve_assignment_batched,
)

RNG = np.random.default_rng(0)


def _total(cost, rows_to_cols):
    return float(sum(cost[i, c] for i, c in enumerate(rows_to_cols)))


@pytest.mark.parametrize("t,q", [(1, 1), (3, 3), (5, 20), (25, 200), (7, 8)])
def test_matches_scipy_optimum(t, q):
    from scipy.optimize import linear_sum_assignment

    for trial in range(5):
        cost = RNG.standard_normal((t, q)).astype(np.float32) * 10
        got = np.asarray(solve_assignment(jnp.asarray(cost)))
        assert len(set(got.tolist())) == t  # distinct columns
        rows, cols = linear_sum_assignment(cost)
        want = np.zeros(t, np.int64)
        want[rows] = cols
        np.testing.assert_allclose(
            _total(cost, got), _total(cost, want), rtol=1e-5, atol=1e-4
        )


def test_padded_targets_big_cost():
    """DETR-style use: padded target rows carry a large constant cost; they
    must still receive distinct columns without disturbing real rows."""
    from scipy.optimize import linear_sum_assignment

    t, q = 10, 50
    cost = RNG.standard_normal((t, q)).astype(np.float32)
    cost[6:] = 1e6  # padded rows
    got = np.asarray(solve_assignment(jnp.asarray(cost)))
    assert len(set(got.tolist())) == t
    rows, cols = linear_sum_assignment(cost)
    want = np.zeros(t, np.int64)
    want[rows] = cols
    np.testing.assert_allclose(
        _total(cost, got), _total(cost, want), rtol=1e-6
    )


def test_batched():
    from scipy.optimize import linear_sum_assignment

    b, t, q = 4, 6, 30
    cost = RNG.standard_normal((b, t, q)).astype(np.float32)
    got = np.asarray(solve_assignment_batched(jnp.asarray(cost)))
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        want = np.zeros(t, np.int64)
        want[rows] = cols
        np.testing.assert_allclose(
            _total(cost[i], got[i]), _total(cost[i], want), rtol=1e-5,
            atol=1e-4,
        )
