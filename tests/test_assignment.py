"""On-device Hungarian vs scipy's linear_sum_assignment as the oracle."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from aicamera_tpu.core.assignment import (matching_cascade, min_cost_matching,
                                          solve_square)


def scipy_total(cost):
    r, c = linear_sum_assignment(cost)
    return cost[r, c].sum()


def test_solve_square_optimal_random():
    rng = np.random.RandomState(0)
    for n in (2, 5, 8, 16):
        for _ in range(20):
            cost = rng.rand(n, n).astype(np.float32)
            col4row = np.asarray(solve_square(
                jnp.asarray(cost), jnp.ones(n, bool)))
            assert sorted(col4row.tolist()) == list(range(n))  # permutation
            total = cost[np.arange(n), col4row].sum()
            assert total == np.float32(scipy_total(cost)) or \
                abs(total - scipy_total(cost)) < 1e-4


def test_solve_square_skips_masked_rows():
    cost = np.array([[1.0, 2.0], [5.0, 0.1]], np.float32)
    mask = np.array([False, True])
    col4row = np.asarray(solve_square(jnp.asarray(cost), jnp.asarray(mask)))
    assert col4row[0] == -1
    assert col4row[1] == 1


def test_min_cost_matching_threshold():
    # Only pairs with cost <= max_distance may match
    cost = np.array([
        [0.1, 0.9],
        [0.9, 0.05],
        [0.9, 0.9],
    ], np.float32)
    m = np.asarray(min_cost_matching(
        jnp.asarray(cost), jnp.ones(3, bool), jnp.ones(2, bool),
        jnp.float32(0.5)))
    assert m[0] == 0 and m[1] == 1 and m[2] == -1


def test_min_cost_matching_respects_masks():
    cost = np.zeros((2, 2), np.float32)
    m = np.asarray(min_cost_matching(
        jnp.asarray(cost),
        jnp.asarray([True, False]),
        jnp.asarray([False, True]),
        jnp.float32(0.5)))
    assert m[0] == 1 and m[1] == -1


def test_min_cost_matching_prefers_minimum_total():
    # Row competition: scipy semantics, row 1 wins the cheap column and row 0
    # falls back to its own feasible column.
    cost = np.array([
        [0.2, 0.3],
        [0.1, 0.9],
    ], np.float32)
    m = np.asarray(min_cost_matching(
        jnp.asarray(cost), jnp.ones(2, bool), jnp.ones(2, bool),
        jnp.float32(0.5)))
    assert m[0] == 1 and m[1] == 0


def test_min_cost_matching_more_rows_than_cols_matches_scipy():
    rng = np.random.RandomState(1)
    for _ in range(20):
        cost = rng.rand(6, 3).astype(np.float32)
        m = np.asarray(min_cost_matching(
            jnp.asarray(cost), jnp.ones(6, bool), jnp.ones(3, bool),
            jnp.float32(2.0)))
        r, c = linear_sum_assignment(cost)
        ours = cost[[i for i in range(6) if m[i] >= 0],
                    [m[i] for i in range(6) if m[i] >= 0]].sum()
        assert abs(ours - cost[r, c].sum()) < 1e-5
        assert (m >= 0).sum() == 3


def test_solve_square_single_row_prefers_row_minimum():
    """Regression for the pre-assignment phase: a lone eligible row must
    take its own cheapest column, not the first column whose argmin it is
    (classical JV column reduction gets this wrong for masked rows)."""
    cost = np.array([[5.0, 1.0], [9.0, 9.0]], np.float32)
    m = np.asarray(solve_square(jnp.asarray(cost),
                                jnp.asarray([True, False])))
    assert m[0] == 1 and m[1] == -1


def test_solve_square_near_diagonal_structured():
    """Near-diagonal matrices (the tracking steady state, served by the
    vectorized pre-assignment with zero augments) vs the scipy optimum."""
    rng = np.random.RandomState(3)
    for n in (8, 32, 64):
        for _ in range(10):
            cost = rng.rand(n, n).astype(np.float32) * 0.3 + 0.7
            diag = rng.permutation(n)
            cost[np.arange(n), diag] = rng.rand(n).astype(np.float32) * 0.05
            col4row = np.asarray(solve_square(
                jnp.asarray(cost), jnp.ones(n, bool)))
            total = cost[np.arange(n), col4row].sum()
            assert abs(total - scipy_total(cost)) < 1e-4


def test_solve_square_ties_and_duplicates_optimal_total():
    """Heavily tied matrices (duplicate rows/cols, quantized costs): the
    chosen assignment may differ from scipy's but the total must match."""
    rng = np.random.RandomState(4)
    for n in (6, 16):
        for _ in range(15):
            cost = (rng.randint(0, 4, (n, n)) * 0.25).astype(np.float32)
            cost[n // 2] = cost[0]          # duplicate row
            cost[:, n // 2] = cost[:, 0]    # duplicate column
            col4row = np.asarray(solve_square(
                jnp.asarray(cost), jnp.ones(n, bool)))
            assert sorted(col4row.tolist()) == list(range(n))
            total = cost[np.arange(n), col4row].sum()
            assert abs(total - scipy_total(cost)) < 1e-4


def test_solve_square_collision_heavy():
    """Every row's argmin is the same column — the pre-assignment places
    one row, the augmenting phase must still reach the optimum."""
    rng = np.random.RandomState(5)
    for _ in range(10):
        n = 12
        cost = rng.rand(n, n).astype(np.float32) + 1.0
        cost[:, 0] = rng.rand(n).astype(np.float32) * 0.1  # shared magnet
        col4row = np.asarray(solve_square(
            jnp.asarray(cost), jnp.ones(n, bool)))
        total = cost[np.arange(n), col4row].sum()
        assert abs(total - scipy_total(cost)) < 1e-4


def test_cascade_prioritizes_recent_tracks():
    # Track 0 at level 2 (tsu=2), track 1 at level 1 (tsu=1). Both want det 0;
    # the cascade gives it to the more recently updated track even though the
    # older track is cheaper (reference linear_assignment.py:129-151).
    cost = np.array([
        [0.01, 1.0],
        [0.10, 1.0],
    ], np.float32)
    tsu = np.array([2, 1], np.int32)
    eligible = np.ones(2, bool)
    det_valid = np.array([True, False])
    match, det_unmatched = matching_cascade(
        jnp.asarray(cost), jnp.asarray(tsu), jnp.asarray(eligible),
        jnp.asarray(det_valid), max_distance=0.2, cascade_depth=5)
    match = np.asarray(match)
    assert match[1] == 0  # recent track wins
    assert match[0] == -1  # nothing left for the older track
    assert not np.asarray(det_unmatched)[0]


def test_cascade_multiple_levels():
    cost = np.array([
        [0.01, 0.15],
        [0.10, 0.02],
    ], np.float32)
    tsu = np.array([3, 1], np.int32)
    match, det_unmatched = matching_cascade(
        jnp.asarray(cost), jnp.asarray(tsu), jnp.ones(2, bool),
        jnp.ones(2, bool), max_distance=0.2, cascade_depth=5)
    match = np.asarray(match)
    # level 1: track 1 takes det 1 (its min). level 3: track 0 takes det 0.
    assert match[1] == 1
    assert match[0] == 0
    assert not np.asarray(det_unmatched).any()


def test_cascade_single_level_fast_path_matches_general():
    """The lax.cond fast path (all eligible tracks at ONE level) must agree
    with the general level loop on the same sub-problem. The general path is
    genuinely forced by appending an extra ELIGIBLE track at a second level
    whose whole cost row is infeasible (> max_distance): two distinct
    eligible levels -> `one_level` is False -> the while_loop runs, yet the
    extra track can never match or claim a detection, so the solved
    sub-problem over the original rows is identical."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        cost = rng.uniform(0.0, 0.4, size=(6, 5)).astype(np.float32)
        eligible = rng.random(6) < 0.8
        det_valid = rng.random(5) < 0.8
        if not eligible.any() or not det_valid.any():
            continue
        # fast path: every eligible track at level 1
        tsu_flat = np.ones(6, np.int32)
        m1, u1 = matching_cascade(
            jnp.asarray(cost), jnp.asarray(tsu_flat), jnp.asarray(eligible),
            jnp.asarray(det_valid), max_distance=0.2, cascade_depth=70)
        # general path: same rows plus an eligible level-2 track with an
        # all-infeasible row (0.9 > 0.2 everywhere)
        cost_g = np.vstack([cost, np.full((1, 5), 0.9, np.float32)])
        tsu_g = np.concatenate([tsu_flat, [2]]).astype(np.int32)
        eligible_g = np.concatenate([eligible, [True]])
        m2, u2 = matching_cascade(
            jnp.asarray(cost_g), jnp.asarray(tsu_g), jnp.asarray(eligible_g),
            jnp.asarray(det_valid), max_distance=0.2, cascade_depth=70)
        m2 = np.asarray(m2)
        assert m2[6] == -1  # the infeasible forcing row never matches
        np.testing.assert_array_equal(np.asarray(m1), m2[:6])
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_cascade_excludes_tracks_beyond_depth():
    """An eligible track whose tsu exceeds cascade_depth (transiently
    alive until mark_missed deletes it) must never match — including on
    the single-level fast path where it is the ONLY eligible track."""
    cost = np.array([[0.01]], np.float32)
    match, det_unmatched = matching_cascade(
        jnp.asarray(cost), jnp.asarray(np.array([71], np.int32)),
        jnp.ones(1, bool), jnp.ones(1, bool),
        max_distance=0.2, cascade_depth=70)
    assert int(np.asarray(match)[0]) == -1
    assert bool(np.asarray(det_unmatched)[0])
    # and mixed with TWO distinct valid levels (tsu 1 and 2), which forces
    # the general while_loop path (`one_level` is False): the beyond-depth
    # track must be excluded there too, even though its row is cheapest
    cost2 = np.array([[0.01, 0.01], [0.05, 0.10], [0.02, 0.03]], np.float32)
    match2, _ = matching_cascade(
        jnp.asarray(cost2), jnp.asarray(np.array([71, 1, 2], np.int32)),
        jnp.ones(3, bool), jnp.ones(2, bool),
        max_distance=0.2, cascade_depth=70)
    match2 = np.asarray(match2)
    assert match2[0] == -1  # beyond depth, never matches
    assert match2[1] == 0  # level 1 solves first, takes its row min
    assert match2[2] == 1  # level 2 gets the remaining detection


def test_solve_square_fast_path_skips_augments_correctly():
    """Matrices engineered so pre-assignment fully resolves (distinct
    argmin columns) must give the scipy optimum via the skip path."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(11)
    for _ in range(5):
        n = 8
        base = rng.uniform(1.0, 2.0, size=(n, n)).astype(np.float32)
        perm = rng.permutation(n)
        base[np.arange(n), perm] = rng.uniform(0.0, 0.1, size=n)
        got = np.asarray(solve_square(jnp.asarray(base),
                                      jnp.ones(n, bool)))
        _, want = linear_sum_assignment(base)
        np.testing.assert_array_equal(got, want)
