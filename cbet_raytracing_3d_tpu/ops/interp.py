"""Vectorized piecewise-linear interpolation.

Semantics match the reference device routine (``launch_ray_XZ.cu:16-63``):
binary-search segment lookup over an increasing *or* decreasing abscissa with
clamping at both ends, then linear interpolation.  Here the per-ray binary
search becomes a single vectorized ``searchsorted`` + gather — or, for
uniformly spaced tables (the beam power table, ``main.cu:102-110``), pure
index arithmetic with no search at all.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp(y: jnp.ndarray, x: jnp.ndarray, xp: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation of table ``(x, y)`` at points ``xp``.

    Handles increasing or decreasing ``x`` (launch_ray_XZ.cu:20,41) and clamps
    to the end values outside the table range (launch_ray_XZ.cu:22-25,43-46).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    increasing = x[0] <= x[-1]
    # jnp.interp requires increasing xp; flip the table for the decreasing case.
    xs = jnp.where(increasing, x, x[::-1])
    ys = jnp.where(increasing, y, y[::-1])
    return jnp.interp(jnp.asarray(xp), xs, ys)


def uniform_interp(y: jnp.ndarray, x0, dx_table, xp: jnp.ndarray) -> jnp.ndarray:
    """Interpolate a table sampled uniformly at ``x0 + i*dx_table``.

    No search: the segment index is direct arithmetic.  Clamps at both ends.
    """
    y = jnp.asarray(y)
    n = y.shape[0]
    t = (jnp.asarray(xp) - x0) / dx_table
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    frac = jnp.clip(t - i, 0.0, None)
    frac = jnp.where(t >= n - 1, 1.0, jnp.where(t <= 0, 0.0, frac))
    return y[i] + (y[i + 1] - y[i]) * frac
