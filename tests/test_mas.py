"""MAS kernel tests: C++ vs numpy vs brute force."""

import itertools

import numpy as np
import pytest

from cosy_tpu.ops.mas import maximum_path, _maximum_path_numpy
from cosy_tpu.native import mas_module


def brute_force_best_path(value: np.ndarray) -> np.ndarray:
    """Enumerate all monotonic alignments (each y assigned one x; x
    non-decreasing by at most 1 per step; starts at 0, ends at t_x-1)."""
    t_x, t_y = value.shape
    best, best_path = -np.inf, None
    def rec(y, x, score, assign):
        nonlocal best, best_path
        if y == t_y:
            if x == t_x - 1 and score > best:
                best = score
                best_path = list(assign)
            return
        for nx in (x, x + 1) if y > 0 else (0,):
            if nx < t_x and t_x - 1 - nx <= t_y - 1 - y:
                assign.append(nx)
                rec(y + 1, nx, score + value[nx, y], assign)
                assign.pop()
    rec(0, -1, 0.0, [])
    path = np.zeros((t_x, t_y), np.int32)
    for y, x in enumerate(best_path):
        path[x, y] = 1
    return path


@pytest.mark.parametrize("t_x,t_y", [(3, 5), (4, 4), (2, 7), (5, 6)])
def test_mas_matches_brute_force(t_x, t_y):
    rng = np.random.default_rng(t_x * 10 + t_y)
    value = rng.standard_normal((t_x, t_y)).astype(np.float32)
    want = brute_force_best_path(value.copy())
    got = _maximum_path_numpy(value.copy(), t_x, t_y)
    np.testing.assert_array_equal(got, want)


def test_mas_batched_native_matches_numpy():
    rng = np.random.default_rng(0)
    B, Tx, Ty = 4, 6, 9
    value = rng.standard_normal((B, Tx, Ty)).astype(np.float32)
    t_xs = np.array([6, 4, 3, 5], np.int32)
    t_ys = np.array([9, 7, 5, 9], np.int32)

    got = maximum_path(value, t_xs, t_ys)

    want = np.zeros((B, Tx, Ty), np.int32)
    for b in range(B):
        v = value[b, : t_xs[b], : t_ys[b]].copy()
        want[b, : t_xs[b], : t_ys[b]] = _maximum_path_numpy(v, int(t_xs[b]), int(t_ys[b]))
    np.testing.assert_array_equal(got, want)
    # each valid column selects exactly one x
    for b in range(B):
        assert (got[b, :, : t_ys[b]].sum(axis=0) == 1).all()


def test_native_extension_builds():
    assert mas_module() is not None, "C++ MAS extension failed to build"


def test_mas_jax_callback():
    import jax.numpy as jnp
    import jax
    from cosy_tpu.ops.mas import maximum_path_jax

    rng = np.random.default_rng(1)
    value = rng.standard_normal((2, 4, 6)).astype(np.float32)
    t_xs = np.array([4, 3], np.int32)
    t_ys = np.array([6, 5], np.int32)
    got = jax.jit(maximum_path_jax)(jnp.asarray(value), jnp.asarray(t_xs), jnp.asarray(t_ys))
    want = maximum_path(value, t_xs, t_ys)
    np.testing.assert_array_equal(np.asarray(got), want)
