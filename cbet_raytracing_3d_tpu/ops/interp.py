"""Vectorized piecewise-linear interpolation — the production table-lookup
component (SURVEY.md §2.8).

Semantics match the reference device routine (``launch_ray_XZ.cu:16-63``):
binary-search segment lookup over an increasing *or* decreasing abscissa with
clamping at both ends, then linear interpolation.  Here the per-ray binary
search becomes a single vectorized ``searchsorted``-based ``interp`` — or,
for uniformly spaced tables (the beam power table, ``main.cu:102-110``),
pure index arithmetic with no search at all.

Both functions are array-module generic: NumPy inputs stay NumPy (the
float64 host precompute in ``fields.py``/``beams.py`` — node fields and
launch energies — must not round-trip through a float32 device), jax arrays
take the jnp path (device-side/table lookups in tests and diagnostics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mod(*arrays):
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def interp(y, x, xp):
    """Piecewise-linear interpolation of table ``(x, y)`` at points ``xp``.

    Handles increasing or decreasing ``x`` (launch_ray_XZ.cu:20,41) and clamps
    to the end values outside the table range (launch_ray_XZ.cu:22-25,43-46).
    """
    m = _mod(y, x, xp)
    x = m.asarray(x)
    y = m.asarray(y)
    increasing = x[0] <= x[-1]
    # np.interp/jnp.interp require an increasing abscissa; flip for the
    # decreasing case (m.where keeps this traceable under jit)
    xs = m.where(increasing, x, x[::-1])
    ys = m.where(increasing, y, y[::-1])
    return m.interp(m.asarray(xp), xs, ys)


def uniform_interp(y, x0, dx_table, xp):
    """Interpolate a table sampled uniformly at ``x0 + i*dx_table``.

    No search: the segment index is direct arithmetic.  Clamps at both ends.
    """
    m = _mod(y, xp)
    y = m.asarray(y)
    n = y.shape[0]
    t = (m.asarray(xp) - x0) / dx_table
    i = m.clip(m.floor(t).astype(m.int32 if m is jnp else np.int64), 0, n - 2)
    frac = m.clip(t - i, 0.0, None)
    frac = m.where(t >= n - 1, 1.0, m.where(t <= 0, 0.0, frac))
    return y[i] + (y[i + 1] - y[i]) * frac
