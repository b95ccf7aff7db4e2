"""Monotonic Alignment Search (host op + JAX bridge).

Capability-parity port of the reference's Cython MAS kernel
(matcha/utils/monotonic_align — used by Matcha-TTS training,
matcha_tts.py:153).  The DP is the public Glow-TTS/VITS recurrence.

Three execution paths:
- C++ extension (cosy_tpu/native/mas.cpp, OpenMP batch loop) — default;
- pure numpy fallback (same code path shape);
- ``maximum_path_jax`` wraps the host kernel for use inside jit via
  ``jax.pure_callback`` (the DP is sequential in T_y and branchy — a host
  kernel beats a lax.scan translation on TPU for the tiny alignment grids).
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e9


def _maximum_path_numpy(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """(t_x, t_y) log-likelihood grid -> binary path; value modified in place."""
    path = np.zeros((t_x, t_y), np.int32)
    for y in range(t_y):
        x_lo = max(0, t_x + y - t_y)
        x_hi = min(t_x - 1, y)
        for x in range(x_lo, x_hi + 1):
            v_cur = NEG_INF if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else NEG_INF
            else:
                v_prev = NEG_INF if y == 0 else value[x - 1, y - 1]
            value[x, y] += max(v_cur, v_prev)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or value[index, y - 1] < value[index - 1, y - 1]):
            index -= 1
    return path


def maximum_path(
    value: np.ndarray,  # (B, T_x, T_y) float32 log-likelihoods
    t_xs: np.ndarray,  # (B,) valid text lengths
    t_ys: np.ndarray,  # (B,) valid mel lengths
) -> np.ndarray:
    """Batched MAS -> (B, T_x, T_y) int32 binary alignment paths."""
    from ..native import mas_module

    value = np.ascontiguousarray(value, np.float32).copy()
    B, Tx, Ty = value.shape
    t_xs = np.ascontiguousarray(t_xs, np.int32)
    t_ys = np.ascontiguousarray(t_ys, np.int32)
    path = np.zeros((B, Tx, Ty), np.int32)

    mod = mas_module()
    if mod is not None:
        mod.maximum_path(value, path, t_xs.tobytes(), t_ys.tobytes(), B, Tx, Ty)
        return path
    for b in range(B):
        tx, ty = int(t_xs[b]), int(t_ys[b])
        if tx > 0 and ty > 0:
            path[b, :tx, :ty] = _maximum_path_numpy(value[b, :tx, :ty], tx, ty)
    return path


def maximum_path_jax(value, t_xs, t_ys):
    """jit-compatible wrapper: host callback around the native kernel."""
    import jax
    import jax.numpy as jnp

    out_shape = jax.ShapeDtypeStruct(value.shape, jnp.int32)
    return jax.pure_callback(
        lambda v, x, y: maximum_path(np.asarray(v), np.asarray(x), np.asarray(y)),
        out_shape, value, t_xs, t_ys, vmap_method="sequential",
    )
